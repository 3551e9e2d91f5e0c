"""Interpret-mode checks for the Pallas envelope kernel.

Contract vs lower_envelope: identical (best, site, payloads) wherever a lane
has at least one finite site; lanes with NO finite site may differ in raw
site/best values but must carry payload-valid == 0 (batch_edt masks on it).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gie_mapping_tpu.ops.edt_batch import lower_envelope
from gie_mapping_tpu.ops.pallas import envelope as env_mod


@pytest.fixture
def interp(monkeypatch):
    orig = env_mod.pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(env_mod.pl, "pallas_call", patched)
    # the jit cache would return the compiled (non-interpret) version
    env_mod._envelope_2d._clear_cache()
    env_mod._envelope_mid_3d._clear_cache()
    yield
    env_mod._envelope_2d._clear_cache()
    env_mod._envelope_mid_3d._clear_cache()


def _pack_valid(coc, valid):
    return (coc << 1) | valid


def test_envelope_pallas_matches_dense(interp):
    rng = np.random.default_rng(5)
    N, L = 50, 300
    big = 1 << 28
    fsq = np.where(rng.random((N, L)) < 0.85, big,
                   rng.integers(0, 400, (N, L))).astype(np.int32)
    # guarantee every lane has a site
    fsq[rng.integers(0, N, L), np.arange(L)] = rng.integers(0, 400, L)
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (N, L)).astype(np.int32), valid)

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b0, s0, p0 = lower_envelope(f, payloads=(p,), chunk=8)
    b1, s1, p1 = env_mod.envelope_pallas(f, payloads=(p,))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_envelope_pallas_band_limited(interp):
    """Sites only in rows [17, 29): the dynamic site-bound path must still be
    exact, and site-free lanes must come back payload-invalid."""
    rng = np.random.default_rng(9)
    N, L = 64, 260
    big = 1 << 28
    fsq = np.full((N, L), big, np.int32)
    band = rng.random((12, L)) < 0.4
    fsq[17:29][band] = rng.integers(0, 900, band.sum())
    # leave lanes 200+ completely siteless
    fsq[:, 200:] = big
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (N, L)).astype(np.int32), valid)

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b0, s0, p0 = lower_envelope(f, payloads=(p,), chunk=8)
    b1, s1, p1 = env_mod.envelope_pallas(f, payloads=(p,))

    has_site = valid.any(axis=0)
    np.testing.assert_array_equal(np.asarray(b0)[:, has_site],
                                  np.asarray(b1)[:, has_site])
    np.testing.assert_array_equal(np.asarray(s0)[:, has_site],
                                  np.asarray(s1)[:, has_site])
    np.testing.assert_array_equal(np.asarray(p0)[:, has_site],
                                  np.asarray(p1)[:, has_site])
    # siteless lanes: payload-valid bit must be 0 under BOTH implementations
    assert not (np.asarray(p1)[:, ~has_site] & 1).any()
    assert not (np.asarray(p0)[:, ~has_site] & 1).any()


def test_envelope_mono_carry_exact(interp):
    """The winner-monotonicity carry (prev chunk's last-row winner tightens
    the next chunk's loop lower bound) must stay exact across many chunks
    with gaps, early/late clusters, and heterogeneous lanes."""
    rng = np.random.default_rng(77)
    N, L = 330, 260  # 6 x-chunks
    big = 1 << 28
    fsq = np.full((N, L), big, np.int32)
    fsq[5:9, :100] = rng.integers(0, 40, (4, 100))          # early cluster
    fsq[300:305, 50:200] = rng.integers(0, 40, (5, 150))    # late cluster
    sprinkle = rng.random((N, L)) < 0.004
    fsq[sprinkle] = rng.integers(0, 3000, sprinkle.sum())
    fsq[:, 240:] = big                                      # siteless lanes
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (N, L)).astype(np.int32), valid)

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b0, s0, p0 = lower_envelope(f, payloads=(p,), chunk=8)
    b1, s1, p1 = env_mod.envelope_pallas(f, payloads=(p,), mono=True)
    b2, s2, p2 = env_mod.envelope_pallas(f, payloads=(p,), mono=False)
    b3, s3, p3 = env_mod.envelope_pallas(f, payloads=(p,), fusepay=True)
    b4, s4, p4 = env_mod.envelope_pallas(f, payloads=(p,), mono=True,
                                         fusepay=True)

    has_site = valid.any(axis=0)
    for name, (bx, sx, px) in {"mono": (b1, s1, p1),
                               "nomono": (b2, s2, p2),
                               "fusepay": (b3, s3, p3),
                               "mono+fusepay": (b4, s4, p4)}.items():
        np.testing.assert_array_equal(np.asarray(b0)[:, has_site],
                                      np.asarray(bx)[:, has_site], err_msg=name)
        np.testing.assert_array_equal(np.asarray(s0)[:, has_site],
                                      np.asarray(sx)[:, has_site], err_msg=name)
        np.testing.assert_array_equal(np.asarray(p0)[:, has_site],
                                      np.asarray(px)[:, has_site], err_msg=name)


def test_envelope_packed_out_matches_unpacked(interp):
    """packed_out=True must be exactly (best << idx_bits) | site of the
    unpacked mode, in both the flat and mid kernels and the dense fallback
    (including inactive tiles and empty-band chunks)."""
    rng = np.random.default_rng(41)
    N, L = 70, 300
    big = 1 << 28
    fsq = np.full((N, L), big, np.int32)
    fsq[30:38, :120] = rng.integers(0, 500, (8, 120))
    fsq[2, 150:200] = 7
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (N, L)).astype(np.int32), valid)
    ib = (N - 1).bit_length()

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b1, s1, p1 = env_mod.envelope_pallas(f, payloads=(p,))
    pk, p2 = env_mod.envelope_pallas(f, payloads=(p,), packed_out=True)
    np.testing.assert_array_equal(
        np.asarray(pk), (np.asarray(b1) << ib) | np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    # dense fallback: packed values agree on sited lanes (siteless lanes may
    # pick a different — equally infinite — site; payload-valid is 0 both
    # ways, which is what batch_edt masks on)
    pk0, p0 = lower_envelope(f, payloads=(p,), chunk=8, packed_out=True)
    has_site = valid.any(axis=0)
    np.testing.assert_array_equal(np.asarray(pk0)[:, has_site],
                                  np.asarray(pk)[:, has_site])
    np.testing.assert_array_equal(np.asarray(p0)[:, has_site],
                                  np.asarray(p2)[:, has_site])
    assert not (np.asarray(p2)[:, ~has_site] & 1).any()
    assert not (np.asarray(p0)[:, ~has_site] & 1).any()

    # fusepay x packed_out composition
    pkf, pf = env_mod.envelope_pallas(f, payloads=(p,), packed_out=True,
                                      fusepay=True)
    np.testing.assert_array_equal(np.asarray(pkf)[:, has_site],
                                  np.asarray(pk)[:, has_site])
    np.testing.assert_array_equal(np.asarray(pf)[:, has_site],
                                  np.asarray(p2)[:, has_site])

    # batch of 3 for the mid kernel, middle one completely siteless
    fm = jnp.asarray(np.stack([fsq, np.full_like(fsq, big), fsq]))
    pm = jnp.asarray(np.stack([pay, np.zeros_like(pay), pay]))
    bm, sm, pm1 = env_mod.envelope_mid_pallas(fm, payloads=(pm,))
    pkm, pm2 = env_mod.envelope_mid_pallas(fm, payloads=(pm,),
                                           packed_out=True)
    np.testing.assert_array_equal(
        np.asarray(pkm), (np.asarray(bm) << ib) | np.asarray(sm))
    np.testing.assert_array_equal(np.asarray(pm1), np.asarray(pm2))
    # mid-kernel fusepay composition: packed word identical everywhere (same
    # reduction); payloads identical on sited lanes, valid bit 0 on the rest
    pkmf, pmf = env_mod.envelope_mid_pallas(fm, payloads=(pm,),
                                            packed_out=True, fusepay=True)
    np.testing.assert_array_equal(np.asarray(pkmf), np.asarray(pkm))
    hs_m = np.stack([valid.any(0)] * 2)[:, None, :].repeat(N, 1)  # [2, N, L]
    np.testing.assert_array_equal(np.asarray(pmf)[[0, 2]][hs_m],
                                  np.asarray(pm2)[[0, 2]][hs_m])
    assert not (np.asarray(pmf)[[0, 2]][~hs_m] & 1).any()


def test_envelope_mid_matches_flat(interp):
    """The batched middle-axis kernel must agree with the flat kernel applied
    to the transposed input, on every sited lane."""
    rng = np.random.default_rng(13)
    B, N, L = 9, 40, 150
    big = 1 << 28
    fsq = np.where(rng.random((B, N, L)) < 0.9, big,
                   rng.integers(0, 700, (B, N, L))).astype(np.int32)
    # leave batch 4 completely siteless, give batch 5 a single far site
    fsq[4] = big
    fsq[5] = big
    fsq[5, 37, 90] = 123
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (B, N, L)).astype(np.int32), valid)

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b1, s1, p1 = env_mod.envelope_mid_pallas(f, payloads=(p,))
    # oracle: flat lower_envelope on [N, B, L]
    b0, s0, p0 = lower_envelope(jnp.moveaxis(f, 1, 0),
                                payloads=(jnp.moveaxis(p, 1, 0),), chunk=8)
    b0 = np.moveaxis(np.asarray(b0), 0, 1)
    s0 = np.moveaxis(np.asarray(s0), 0, 1)
    p0 = np.moveaxis(np.asarray(p0), 0, 1)

    has_site = valid.any(axis=1)  # [B, L]
    m = np.repeat(has_site[:, None, :], N, axis=1)
    np.testing.assert_array_equal(b0[m], np.asarray(b1)[m])
    np.testing.assert_array_equal(s0[m], np.asarray(s1)[m])
    np.testing.assert_array_equal(p0[m], np.asarray(p1)[m])
    # siteless lanes: payload-valid bit 0
    assert not (np.asarray(p1)[np.repeat(~has_site[:, None, :], N, 1)] & 1).any()


def test_batch_edt_mid_matches_default(interp):
    """batch_edt(mid=True) (interpret-mode pallas) == batch_edt (dense)."""
    from gie_mapping_tpu.ops.edt_batch import batch_edt

    rng = np.random.default_rng(31)
    shape = (24, 20, 12)
    occ = (rng.random(shape) < 0.04)
    glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
    mw = sum(shape)
    ref = batch_edt(glb, max_width=mw, pallas=False)
    got = batch_edt(glb, max_width=mw, pallas=True, mid=True)
    for k in ("dist_sq", "coc", "valid"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)


def test_envelope_pallas_multichunk_sparse(interp):
    """N spans several 64-row x-chunks with sparse clustered sites: the
    per-(tile, chunk) coarse-to-fine bands must stay exact on sited lanes."""
    rng = np.random.default_rng(21)
    N, L = 200, 400
    big = 1 << 28
    fsq = np.full((N, L), big, np.int32)
    # a dense cluster, a lone far site per lane subset, and random sprinkle
    fsq[40:48, :150] = rng.integers(0, 50, (8, 150))
    fsq[190, 100:300] = rng.integers(0, 1000, 200)
    sprinkle = rng.random((N, L)) < 0.005
    fsq[sprinkle] = rng.integers(0, 5000, sprinkle.sum())
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (N, L)).astype(np.int32), valid)

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b0, s0, p0 = lower_envelope(f, payloads=(p,), chunk=8)
    b1, s1, p1 = env_mod.envelope_pallas(f, payloads=(p,))

    has_site = valid.any(axis=0)
    np.testing.assert_array_equal(np.asarray(b0)[:, has_site],
                                  np.asarray(b1)[:, has_site])
    np.testing.assert_array_equal(np.asarray(s0)[:, has_site],
                                  np.asarray(s1)[:, has_site])
    np.testing.assert_array_equal(np.asarray(p0)[:, has_site],
                                  np.asarray(p1)[:, has_site])


def test_batch_edt_env_variants_identical(interp):
    """batch_edt(env_variant=...) plumbing: all four kernel loop variants
    produce bit-identical EDT outputs (the variants only reshape the
    reduction loop; cfg.edt_env_variant selects them per case)."""
    from gie_mapping_tpu.ops.edt_batch import _ENV_VARIANTS, batch_edt

    rng = np.random.default_rng(47)
    shape = (24, 20, 12)
    occ = (rng.random(shape) < 0.05)
    glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
    mw = sum(shape)
    ref = batch_edt(glb, max_width=mw, pallas=False)
    for name in _ENV_VARIANTS:
        got = batch_edt(glb, max_width=mw, pallas=True, env_variant=name)
        for k in ("dist_sq", "coc", "valid"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]),
                err_msg=f"{name}:{k}")


def test_envelope_cf_exact(interp):
    """The coarse-to-fine variant (SUB-row sub-chunks, winner-bracket bands,
    monotonicity carry) must be bit-exact vs the dense oracle on adversarial
    site layouts: early/late clusters (wide winner jumps across chunk
    boundaries), heterogeneous lanes inside one tile (near + far from sites),
    siteless lanes, and sites in the 8-row padding tail."""
    rng = np.random.default_rng(55)
    N, L = 330, 260  # 6 x-chunks, padded site tail (330 -> 336)
    big = 1 << 28
    fsq = np.full((N, L), big, np.int32)
    fsq[5:9, :100] = rng.integers(0, 40, (4, 100))          # early cluster
    fsq[300:305, 50:200] = rng.integers(0, 40, (5, 150))    # late cluster
    fsq[329, 130] = 3                                       # last-row site
    sprinkle = rng.random((N, L)) < 0.004
    fsq[sprinkle] = rng.integers(0, 3000, sprinkle.sum())
    fsq[:, 240:] = big                                      # siteless lanes
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (N, L)).astype(np.int32), valid)

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b0, s0, p0 = lower_envelope(f, payloads=(p,), chunk=8)
    has_site = valid.any(axis=0)
    for kw in ({"cf": True}, {"cf": True, "fusepay": True}):
        bx, sx, px = env_mod.envelope_pallas(f, payloads=(p,), **kw)
        np.testing.assert_array_equal(np.asarray(b0)[:, has_site],
                                      np.asarray(bx)[:, has_site],
                                      err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(s0)[:, has_site],
                                      np.asarray(sx)[:, has_site],
                                      err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(p0)[:, has_site],
                                      np.asarray(px)[:, has_site],
                                      err_msg=str(kw))
        assert not (np.asarray(px)[:, ~has_site] & 1).any()
    # packed_out composition
    ib = (N - 1).bit_length()
    pk, p2 = env_mod.envelope_pallas(f, payloads=(p,), cf=True, fusepay=True,
                                     packed_out=True)
    np.testing.assert_array_equal(
        np.asarray(pk)[:, has_site],
        ((np.asarray(b0) << ib) | np.asarray(s0))[:, has_site])


def test_envelope_cf_mid_exact(interp):
    """cf on the batched middle-axis kernel: bit-exact vs the flat oracle."""
    rng = np.random.default_rng(56)
    B, N, L = 5, 130, 150  # 3 x-chunks per batch slice
    big = 1 << 28
    fsq = np.where(rng.random((B, N, L)) < 0.95, big,
                   rng.integers(0, 700, (B, N, L))).astype(np.int32)
    fsq[1] = big                                            # siteless slice
    fsq[2] = big
    fsq[2, 127, 90] = 11                                    # lone far site
    valid = (fsq < big).astype(np.int32)
    pay = _pack_valid(rng.integers(0, 200, (B, N, L)).astype(np.int32), valid)

    f = jnp.asarray(fsq)
    p = jnp.asarray(pay)
    b1, s1, p1 = env_mod.envelope_mid_pallas(f, payloads=(p,), cf=True,
                                             fusepay=True)
    b0, s0, p0 = lower_envelope(jnp.moveaxis(f, 1, 0),
                                payloads=(jnp.moveaxis(p, 1, 0),), chunk=8)
    b0 = np.moveaxis(np.asarray(b0), 0, 1)
    s0 = np.moveaxis(np.asarray(s0), 0, 1)
    p0 = np.moveaxis(np.asarray(p0), 0, 1)
    has_site = valid.any(axis=1)  # [B, L]
    m = np.repeat(has_site[:, None, :], N, axis=1)
    np.testing.assert_array_equal(b0[m], np.asarray(b1)[m])
    np.testing.assert_array_equal(s0[m], np.asarray(s1)[m])
    np.testing.assert_array_equal(p0[m], np.asarray(p1)[m])
    assert not (np.asarray(p1)[np.repeat(~has_site[:, None, :], N, 1)] & 1).any()


def test_batch_edt_cf_variant(interp):
    """batch_edt(env_variant='cf') == the dense path, through the full
    3-phase transform (interpret-mode pallas)."""
    from gie_mapping_tpu.ops.edt_batch import batch_edt

    rng = np.random.default_rng(57)
    shape = (40, 36, 20)
    occ = (rng.random(shape) < 0.03)
    glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
    mw = sum(shape)
    ref = batch_edt(glb, max_width=mw, pallas=False)
    for mid in (False, True):
        got = batch_edt(glb, max_width=mw, pallas=True, mid=mid,
                        env_variant="cf")
        for k in ("dist_sq", "coc", "valid"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]),
                err_msg=f"{k} mid={mid}")
