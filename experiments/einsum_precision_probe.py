"""Do the geometry einsums (vertex world/clip transforms) run at bf16 on
the TPU MXU under default precision? Compare against numpy f32."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)
    V = 100000
    pos = rng.uniform(-50, 50, (V, 4)).astype(np.float32)
    pos[:, 3] = 1.0
    Wm = rng.normal(0, 1, (V, 4, 4)).astype(np.float32)
    VP = rng.normal(0, 1, (4, 4)).astype(np.float32)

    def f(p, w, vp):
        pw = jnp.einsum("vi,vij->vj", p, w)
        return pw @ vp

    out = np.asarray(jax.jit(f)(pos, Wm, VP))
    ref64 = np.einsum("vi,vij->vj", pos.astype(np.float64),
                      Wm.astype(np.float64)) @ VP.astype(np.float64)
    # f32 reference (numpy single precision, fma-free)
    ref32 = np.einsum("vi,vij->vj", pos, Wm) @ VP
    err_dev = np.abs(out - ref64).max()
    err_f32 = np.abs(ref32 - ref64).max()
    print(f"device-vs-f64 max err {err_dev:.3e}; numpy-f32-vs-f64 "
          f"{err_f32:.3e}; ratio {err_dev / max(err_f32, 1e-30):.1f}x",
          flush=True)

    def fh(p, w, vp):
        pw = jnp.einsum("vi,vij->vj", p, w,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.matmul(pw, vp, precision=jax.lax.Precision.HIGHEST)

    outh = np.asarray(jax.jit(fh)(pos, Wm, VP))
    errh = np.abs(outh - ref64).max()
    print(f"HIGHEST device-vs-f64 max err {errh:.3e}", flush=True)


if __name__ == "__main__":
    main()
