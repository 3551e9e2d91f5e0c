"""A/B the carve panorama-select MXU formulation on device, per canvas class.

A = 3x-bf16 value split + bf16 one-hot (current kernel, ~4 MXU passes/table
    pair less than B); B = f32xf32 precision=HIGHEST one-hot (the previous
    formulation).  Both must be bit-identical to the XLA gather (checked on
    device first).  In-run comparison only (shared link throttles)."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cc():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


_cc()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gie_mapping_tpu.ops.pallas import carve as cv

K = 12
ROUNDS = 4


def _old_kernel(nt, np_, zp, depth_ref, cnt_ref, bt_ref, vbp_ref,
                vd_ref, vc_ref):
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (nt, cv.CS), 0) == bt_ref[0:1, :]
    ).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    a_d = jax.lax.dot_general(depth_ref[:, :], oh, (((1,), (0,)), ((), ())),
                              precision=hi)
    a_c = jax.lax.dot_general(cnt_ref[:, :], oh, (((1,), (0,)), ((), ())),
                              precision=hi)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (np_, cv.CS), 0)
    for z in range(zp):
        m = p_iota == vbp_ref[z:z + 1, :]
        vd_ref[z:z + 1, :] = jnp.sum(jnp.where(m, a_d, 0.0), axis=0,
                                     keepdims=True)
        vc_ref[z:z + 1, :] = jnp.sum(jnp.where(m, a_c, 0.0), axis=0,
                                     keepdims=True)


def _select_with(kernel, depth2d, cnt2d, bt, vbp):
    NT, NP = depth2d.shape
    X, Y, Z = vbp.shape
    C = X * Y
    Cp = -(-C // cv.CS) * cv.CS
    Zp = -(-Z // 8) * 8
    depth_t = depth2d.T
    cnt_t = cnt2d.T.astype(jnp.float32)
    bt_row = jnp.pad(bt.reshape(1, C), ((0, 0), (0, Cp - C)))
    vbp_zc = jnp.pad(vbp.reshape(C, Z).T, ((0, Zp - Z), (0, Cp - C)))
    whole = lambda i: (0, 0)
    outs = pl.pallas_call(
        functools.partial(kernel, NT, NP, Zp),
        grid=(Cp // cv.CS,),
        in_specs=[
            pl.BlockSpec((NP, NT), whole),
            pl.BlockSpec((NP, NT), whole),
            pl.BlockSpec((1, cv.CS), lambda i: (0, i)),
            pl.BlockSpec((Zp, cv.CS), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((Zp, cv.CS), lambda i: (0, i)),
            pl.BlockSpec((Zp, cv.CS), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Zp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((Zp, Cp), jnp.float32),
        ),
    )(depth_t, cnt_t, bt_row, vbp_zc)
    vd = outs[0][:Z, :C].T.reshape(X, Y, Z)
    vc = outs[1][:Z, :C].T.reshape(X, Y, Z).astype(jnp.int32)
    return vd, vc


def timer(fn, *args):
    @jax.jit
    def chain(d, *rest):
        def body(c, _):
            r = fn(d + (c % 1).astype(d.dtype), *rest)
            return c + r[0].reshape(-1)[0], ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    np.asarray(chain(*args))

    def one():
        t0 = time.perf_counter()
        np.asarray(chain(*args))
        return (time.perf_counter() - t0) / K * 1e3

    return one


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    cases = [
        ("cow_lady 100x100x30 nt512 np256", (100, 100, 30), 512, 256),
        ("ugv 200x200x24 nt1024 np512", (200, 200, 24), 1024, 512),
    ]
    for name, (X, Y, Z), NT, NP in cases:
        rng = np.random.default_rng(11)
        depth2d = jnp.asarray(
            np.where(rng.random((NT, NP)) < 0.7, 1e30,
                     rng.uniform(0.05, 8.0, (NT, NP))).astype(np.float32))
        cnt2d = jnp.asarray(rng.integers(0, 40, (NT, NP)).astype(np.int32))
        bt = jnp.asarray(rng.integers(0, NT, (X, Y)).astype(np.int32))
        vbp = jnp.asarray(rng.integers(0, NP, (X, Y, Z)).astype(np.int32))

        # compiled-Mosaic equality vs the XLA gather
        vd_a, vc_a = cv.panorama_select(depth2d, cnt2d, bt, vbp)
        vd_b, vc_b = jax.jit(functools.partial(_select_with, _old_kernel))(
            depth2d, cnt2d, bt, vbp)
        vbin = np.asarray(bt)[:, :, None] * NP + np.asarray(vbp)
        rd = np.asarray(depth2d).reshape(-1)[vbin]
        rc = np.asarray(cnt2d).reshape(-1)[vbin]
        ok_a = (np.array_equal(np.asarray(vd_a), rd)
                and np.array_equal(np.asarray(vc_a), rc))
        ok_b = (np.array_equal(np.asarray(vd_b), rd)
                and np.array_equal(np.asarray(vc_b), rc))
        print(f"{name}: split3==gather {ok_a}  highest==gather {ok_b}")

        t_new = timer(lambda d, c, b, v: cv.panorama_select(d, c, b, v),
                      depth2d, cnt2d, bt, vbp)
        t_old = timer(functools.partial(_select_with, _old_kernel),
                      depth2d, cnt2d, bt, vbp)
        best = {"split3": 1e9, "highest": 1e9}
        for _ in range(ROUNDS):
            best["split3"] = min(best["split3"], t_new())
            best["highest"] = min(best["highest"], t_old())
        print(f"  split3 {best['split3']:.2f}ms   highest {best['highest']:.2f}ms")


if __name__ == "__main__":
    main()
