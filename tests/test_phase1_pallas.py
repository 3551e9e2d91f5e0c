"""Interpret-mode checks for the Pallas packed phase-1 scan kernel
(ops/pallas/phase1.py) and its wiring through batch_edt(p1="pallas").

Contract: bit-identical batch_edt outputs vs the XLA cummax/cummin phase 1
(the packed word carries exactly (g1sq, coc_y, valid); invalid columns pack
to 0, which the envelope unpack maps to the same f=cap the unpacked path
clamps to).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gie_mapping_tpu.ops.edt_batch as eb
from gie_mapping_tpu.ops.edt_batch import _phase1_along_y, batch_edt
from gie_mapping_tpu.ops.pallas import envelope as env_mod
from gie_mapping_tpu.ops.pallas import phase1 as p1_mod


@pytest.fixture
def interp(monkeypatch):
    orig = env_mod.pl.pallas_call  # shared jax.experimental.pallas module

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(env_mod.pl, "pallas_call", patched)
    caches = (env_mod._envelope_2d, env_mod._envelope_mid_3d,
              p1_mod.phase1_packed_pallas, eb.batch_edt,
              eb.batch_edt_sharded)
    for f in caches:
        f._clear_cache()
    yield
    for f in caches:
        f._clear_cache()


def _rand_occ(shape, frac, seed):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) < frac)


@pytest.mark.parametrize("shape", [(16, 50, 12), (9, 33, 7), (8, 8, 130)])
def test_phase1_packed_matches_xla(interp, shape):
    occ = _rand_occ(shape, 0.06, seed=3)
    # one all-empty y-column and one all-occupied
    occ[0, :, 0] = False
    occ[1, :, 1] = True
    mw = sum(shape)
    yb = p1_mod.phase1_pack_bits(shape[1])

    packed = np.asarray(p1_mod.phase1_packed_pallas(
        jnp.asarray(occ.astype(np.int8)), max_width=mw))
    g1, coc_y, valid = (np.asarray(a) for a in
                        _phase1_along_y(jnp.asarray(occ), mw))

    got_valid = (packed & 1) > 0
    np.testing.assert_array_equal(got_valid, valid)
    np.testing.assert_array_equal((packed >> (yb + 1))[valid],
                                  (g1 * g1)[valid])
    np.testing.assert_array_equal(((packed >> 1) & ((1 << yb) - 1))[valid],
                                  coc_y[valid])
    assert (packed[~valid] == 0).all()


@pytest.mark.parametrize("kw", [dict(), dict(mid=True),
                                dict(env_variant="cf"),
                                dict(env_variant="fusepay"),
                                # the production-default triple (allin):
                                # cfg.edt_phase1="pallas" + edt_mid +
                                # env_variant="fusepay"
                                dict(mid=True, env_variant="fusepay")])
def test_batch_edt_p1_pallas_matches(interp, kw):
    shape = (24, 20, 12)
    occ = _rand_occ(shape, 0.04, seed=31)
    glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
    mw = sum(shape)
    ref = batch_edt(glb, max_width=mw, pallas=False)
    got = batch_edt(glb, max_width=mw, pallas=True, p1="pallas", **kw)
    for k in ("dist_sq", "coc", "valid"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)


def test_batch_edt_sharded_p1_pallas_matches(interp):
    import jax

    from gie_mapping_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8)
    shape = (16, 12, 16)
    occ = _rand_occ(shape, 0.08, seed=7)
    glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
    mw = sum(shape)
    ref = batch_edt(glb, max_width=mw, pallas=False)
    got = eb.batch_edt_sharded(glb, max_width=mw, mesh=mesh, pallas=True,
                               p1="pallas")
    for k in ("dist_sq", "coc", "valid"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)


def test_phase1_pack_bits_limit():
    with pytest.raises(ValueError):
        p1_mod.phase1_pack_bits(1025)
    assert p1_mod.phase1_pack_bits(1024) == 10


def test_p1_pallas_falls_back_beyond_pack_budget(interp):
    """Y > 1024 exceeds the packed word's bit budget: batch_edt must warn and
    degrade to the XLA phase 1 (the packed scan is a default, not a
    capability), staying exact."""
    shape = (4, 1030, 4)
    occ = _rand_occ(shape, 0.01, seed=7)
    glb = jnp.asarray(np.where(occ, 2, 0).astype(np.int8))
    mw = sum(shape)
    ref = batch_edt(glb, max_width=mw, pallas=False)
    with pytest.warns(UserWarning, match="Y <= 1024"):
        got = batch_edt(glb, max_width=mw, pallas=True, p1="pallas")
    for k in ("dist_sq", "coc", "valid"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(got[k]),
                                      err_msg=k)
