"""A/B the self-intersection narrow phase on the real TPU: the XLA
dense blockwise sweep (ops/intersection.py) vs the fused Pallas kernel
(ops/intersection_pallas.py), interleaved in one process.

Workload: value_and_grad of the batched energy at PROX production
face count (full-size synthetic SMPL-X, F=20946) over B frames —
the shape the interpenetration term adds to every fitter step.
"""

from __future__ import annotations

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(B: int = 4, reps: int = 6) -> None:
    import jax
    import jax.numpy as jnp

    from lemo_tpu.body_model import load_model, make_forward_fn
    from lemo_tpu.ops import intersection as xi
    from lemo_tpu.ops.intersection_pallas import (
        batched_self_intersection_pallas)
    from lemo_tpu.testing.synthetic import synthetic_smplx_npz

    print("device:", jax.devices()[0])
    md = synthetic_smplx_npz(full_size=True)
    model = load_model(md, use_pca=True, num_pca_comps=12)
    fwd = jax.jit(make_forward_fn(model))
    rng = np.random.RandomState(0)
    frames = []
    for b in range(B):
        p = dict(model.zero_params(1))
        p["body_pose"] = jnp.asarray(rng.randn(1, 63) * 0.7, jnp.float32)
        frames.append(fwd(p, model.consts)["vertices"][0])
    vb = jnp.stack(frames) + jnp.asarray([1.0, 0.5, 2.5])  # scene scale
    faces = jnp.asarray(md["f"].astype(np.int32))
    print(f"B={B} V={vb.shape[1]} F={faces.shape[0]}")

    def e_dense(v):
        return xi.batched_self_intersection(v, faces).sum()

    def e_pallas(v):
        return batched_self_intersection_pallas(v, faces).sum()

    # temporal-coherence candidates (VERDICT r4): the amortized broad
    # phase — one forward-only sweep per window/refresh, then only the
    # K-face subset per optimizer step
    K = 4096
    t0 = time.perf_counter()
    cand_fn = jax.jit(lambda v: xi.intersection_candidates_batched(
        v, faces, K=K, margin=0.05, frame_chunk=1))
    cids, counts = jax.block_until_ready(cand_fn(vb))
    t_cand = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(cand_fn(vb * 1.0001))
    t_cand_warm = time.perf_counter() - t0
    print(f"candidates: K={K} n_active max="
          f"{int(jnp.max(counts[:, 0]))} n_within max="
          f"{int(jnp.max(counts[:, 1]))} "
          f"(compile+run {t_cand:.0f}s, warm {t_cand_warm * 1e3:.0f} ms "
          f"for B={B} frames — once per window, amortized over "
          f"maxiters steps)")

    def e_cand(v):
        return xi.batched_self_intersection(
            v, faces, candidate_ids=cids).sum()

    fns = {}
    for name, f in (("dense", e_dense), ("pallas", e_pallas),
                    ("cand", e_cand)):
        t0 = time.perf_counter()
        g = jax.jit(jax.value_and_grad(f))
        out = jax.block_until_ready(g(vb))
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.0f}s "
              f"E={float(out[0]):.4f}")
        fns[name] = (g, out)

    e_d, g_d = fns["dense"][1]
    for name in ("pallas", "cand"):
        e_p, g_p = fns[name][1]
        gs = float(jnp.abs(g_d).max())
        print(f"{name} vs dense: energy rel "
              f"{abs(float(e_d - e_p)) / float(e_d):.3e}, grad max rel "
              f"{float(jnp.abs(g_d - g_p).max()) / gs:.3e}")

    times = {n: [] for n in fns}
    for i in range(reps):
        for name, (g, _) in fns.items():
            x = vb * (1.0 + 1e-4 * i)   # vary inputs (tunnel artifact)
            t0 = time.perf_counter()
            jax.block_until_ready(g(x))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ms = np.median(ts) * 1e3
        print(f"value_and_grad [{name:7s}]: {ms:9.1f} ms total, "
              f"{ms / B:8.1f} ms/frame")


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    main(B)
