"""Measure the reference's Stage-2 optimizer-step cost in torch on CPU.

The reference (torch 1.4, one 2019-class GPU) publishes no throughput
numbers, so bench.py's `vs_baseline` previously rode on a bare assumption
(~100 frame-iters/s). This script anchors it with a measurement: the same
Stage-2 inner step — batch-100 full-size SMPL-X forward (10475 verts,
sequential 55-joint kinematic chain, exactly the reference's loop
structure, lbs.py:245-251) + marker L1 + L2 priors + Adam backward — in
torch on this machine's CPU. A documented CPU->GPU bracket then yields a
defensible reference-throughput range.

Writes BASELINE_TORCH.json at the repo root (bench.py reads it):

    {"cpu_step_s": ..., "cpu_frame_iters_per_sec": ...,
     "gpu_factor_range": [lo, hi],
     "ref_frame_iters_per_sec_range": [lo, hi]}

The GPU bracket is anchored to the measured SINGLE-THREAD CPU step (this
box exposes one core; torch reports its thread count in the output) and
calibrated from a per-step budget of the reference's loop on a 2019-class
GPU (RTX 2080 Ti, torch 1.4 / CUDA 10, no CUDA graphs):

- kernel-launch floor: the kinematic chain is a Python loop of 55 serial
  tiny batched 4x4 matmuls (lbs.py:245-251); with the backward pass,
  ~1000+ launches x ~10 us = >=15 ms that no GPU FLOPs remove;
- the big matmuls (skinning fwd+bwd ~5 GFLOP at bs=100): ~5-10 ms;
- dozens of elementwise ops over [100, 10475, 3] buffers: ~20-100 ms.

Total 40-150 ms/step -> 670-2500 frame-iters/s, i.e. 3-10x one modern
core (measured ~0.5 s/step quiet). The [3, 10] factor spans
elementwise-heavy to launch-bound mixes; the reference's real PROX loop
is slower still per iteration (per-frame CPU psbody visibility
round-trips, CUDA BVH), so dividing by the bracket's high end
understates our speedup.
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

GPU_FACTOR_RANGE = (3.0, 10.0)


def main() -> None:
    import torch

    from lemo_tpu.data.markers import marker_indices
    from lemo_tpu.testing.synthetic import SMPLX_PARENTS, synthetic_smplx_npz

    md = synthetic_smplx_npz(full_size=True, seed=2)
    B = 100
    t32 = lambda x: torch.as_tensor(np.ascontiguousarray(x),  # noqa: E731
                                    dtype=torch.float32)
    v_template = t32(md["v_template"])
    V = v_template.shape[0]
    J_reg = t32(md["J_regressor"])
    nj = J_reg.shape[0]
    parents = SMPLX_PARENTS[:nj].copy()
    parents[0] = 0
    shapedirs = t32(md["shapedirs"][:, :, :10])
    posedirs = t32(md["posedirs"]).reshape(V * 3, -1)
    weights = t32(md["weights"])
    ids67 = torch.as_tensor(np.asarray(marker_indices(False, num_verts=V)))

    def rodrigues(aa):
        angle = torch.norm(aa + 1e-8, dim=1, keepdim=True)
        axis = aa / angle
        c, s = torch.cos(angle)[:, :, None], torch.sin(angle)[:, :, None]
        x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
        zeros = torch.zeros_like(x)
        K = torch.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros],
                        dim=1).view(-1, 3, 3)
        eye = torch.eye(3)[None]
        return eye + s * K + (1 - c) * torch.bmm(K, K)

    def forward(transl, global_orient, body_pose, betas):
        full_pose = torch.cat(
            [global_orient, body_pose,
             torch.zeros(B, 165 - 66)], dim=1)
        v_shaped = v_template[None] + torch.einsum(
            "vks,bs->bvk", shapedirs, betas)
        Jrest = torch.einsum("jv,bvk->bjk", J_reg, v_shaped)
        rots = rodrigues(full_pose.reshape(-1, 3)).view(B, nj, 3, 3)
        pose_feat = (rots[:, 1:] - torch.eye(3)).reshape(B, -1)
        v_posed = v_shaped + (pose_feat @ posedirs.T).view(B, V, 3)
        # sequential chain — the reference's per-joint loop
        G = [None] * nj
        for j in range(nj):
            T4 = torch.zeros(B, 4, 4)
            T4[:, :3, :3] = rots[:, j]
            T4[:, 3, 3] = 1.0
            T4[:, :3, 3] = Jrest[:, j] - (Jrest[:, parents[j]]
                                          if j > 0 else 0)
            G[j] = T4 if j == 0 else torch.bmm(G[parents[j]], T4)
        G = torch.stack(G, dim=1)
        A = G.clone()
        A[:, :, :3, 3] = A[:, :, :3, 3] - torch.einsum(
            "bjmn,bjn->bjm", G[:, :, :3, :3], Jrest)
        Tv = torch.einsum("vj,bjmn->bvmn", weights, A)
        vh = torch.cat([v_posed, torch.ones(B, V, 1)], dim=2)
        verts = torch.einsum("bvmn,bvn->bvm", Tv, vh)[:, :, :3]
        return verts + transl[:, None, :]

    rng = np.random.RandomState(0)
    transl = torch.tensor(rng.randn(B, 3).astype(np.float32),
                          requires_grad=True)
    orient = torch.tensor((rng.randn(B, 3) * 0.3).astype(np.float32),
                          requires_grad=True)
    pose = torch.tensor((rng.randn(B, 63) * 0.2).astype(np.float32),
                        requires_grad=True)
    betas = torch.tensor(np.zeros((B, 10), np.float32), requires_grad=True)
    target = torch.tensor(rng.randn(B, 67, 3).astype(np.float32))
    opt = torch.optim.Adam([transl, orient, pose, betas], lr=0.01)

    def step():
        opt.zero_grad()
        verts = forward(transl, orient, pose, betas)
        markers = verts[:, ids67]
        loss = (markers - target).abs().mean() \
            + 0.02 * (pose ** 2).sum() + 0.01 * (betas ** 2).sum()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = (time.perf_counter() - t0) / n

    cpu_fips = B / dt
    out = {
        "cpu_step_s": round(dt, 4),
        "cpu_frame_iters_per_sec": round(cpu_fips, 2),
        "gpu_factor_range": list(GPU_FACTOR_RANGE),
        "ref_frame_iters_per_sec_range": [
            round(cpu_fips * GPU_FACTOR_RANGE[0], 1),
            round(cpu_fips * GPU_FACTOR_RANGE[1], 1)],
        "batch": B,
        "torch_threads": __import__("torch").get_num_threads(),
    }
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "BASELINE_TORCH.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
