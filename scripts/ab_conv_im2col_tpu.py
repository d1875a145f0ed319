"""Micro A/B: the smoothness-encoder convs as XLA conv_general_dilated
(NCHW, current) vs an explicit im2col matmul formulation, at the exact
production shape ([1, 1, 243, 99] velocity image, 5 EncBlocks,
stride-(2,1) pools). Times value_and_grad of sum(z) wrt the input —
the shape the S2 smoothness term adds to every optimizer step.
"""

from __future__ import annotations

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    _cache = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      ".jax_compilation_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lemo_tpu.priors import conv_ae as ca

    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    params = ca.init_smooth_enc(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(1, 1, 243, 99), jnp.float32)

    def f_conv(x):
        z, _ = ca.smooth_enc_forward(params, x, downsample=False)
        return (z ** 2).mean()

    def conv_im2col(x, w, b):
        # x [1, C, H, W]; w [O, C, 3, 3] -> same-padding 3x3 conv as one
        # [H*W, 9C] @ [9C, O] matmul
        C, H, W = x.shape[1], x.shape[2], x.shape[3]
        xp = jnp.pad(x[0], ((0, 0), (1, 1), (1, 1)))
        cols = [xp[:, dy:dy + H, dx:dx + W]
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, axis=0)        # [9C, H, W]
        pm = patches.reshape(9 * C, H * W).T           # [HW, 9C]
        wm = w.transpose(2, 3, 1, 0).reshape(9 * C, -1)  # [9C, O]
        y = jnp.matmul(pm, wm)                         # [HW, O]
        return (y.T.reshape(1, -1, H, W) + b[None, :, None, None])

    def enc_im2col(x):
        # EncBlock = conv-lrelu-conv-lrelu; downsample=False -> no pool
        # (models/AE_sep.py shipped configuration)
        h = x
        for blk in range(1, 6):
            w1 = params[f"enc_blc{blk}.main.0.weight"]
            b1 = params[f"enc_blc{blk}.main.0.bias"]
            w2 = params[f"enc_blc{blk}.main.2.weight"]
            b2 = params[f"enc_blc{blk}.main.2.bias"]
            h = jax.nn.leaky_relu(conv_im2col(h, w1, b1), 0.2)
            h = jax.nn.leaky_relu(conv_im2col(h, w2, b2), 0.2)
        return h

    def f_mm(x):
        z = enc_im2col(x)
        return (z ** 2).mean()

    # parity first
    za = ca.smooth_enc_forward(params, x, downsample=False)[0]
    zb = enc_im2col(x)
    d = float(jnp.abs(za - zb).max() / jnp.abs(za).max())
    print(f"enc output rel diff conv-vs-im2col: {d:.3e}")

    # device-side loop: one dispatch runs N value_and_grad evals with
    # iteration-varying inputs (tunnel dispatch overhead is ~40 ms/call,
    # 30x the kernel time — see PERF.md measurement methodology)
    N = 100

    def make_loop(f):
        g = jax.value_and_grad(f)

        def body(carry, s):
            v, gr = g(x * (1.0 + 1e-4 * s))
            return carry + v + gr.mean(), None

        return jax.jit(lambda: jax.lax.scan(
            body, jnp.zeros(()), jnp.arange(N, dtype=jnp.float32))[0])

    fns = {}
    for name, f in (("conv", f_conv), ("im2col", f_mm)):
        t0 = time.perf_counter()
        loop = make_loop(f)
        jax.block_until_ready(loop())
        print(f"{name:7s}: compiled in {time.perf_counter() - t0:.0f}s")
        fns[name] = loop
    times = {n: [] for n in fns}
    for _ in range(6):
        for name, loop in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(loop())
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        print(f"value_and_grad [{name:7s}]: "
              f"{np.median(ts) / N * 1e3:7.3f} ms/eval")


if __name__ == "__main__":
    main()
