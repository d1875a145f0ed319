"""Smoothness-prior evaluation harness (reference test_smooth_prior.py):
encode/decode held-out velocity clips, integrate velocities back, report
reconstruction error, optionally save a skeleton visualization."""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--amass_dir", type=str, required=True)
    p.add_argument("--body_model_path", type=str, required=True)
    p.add_argument("--enc_path", type=str, required=True)
    p.add_argument("--dec_path", type=str, required=True)
    p.add_argument("--stats_path", type=str, required=True)
    p.add_argument("--clip_seconds", type=int, default=4)
    p.add_argument("--with_hand", type=lambda x: x.lower() in ("true", "1"),
                   default=True)
    p.add_argument("--num_clips", type=int, default=4)
    p.add_argument("--out", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp

    from lemo_tpu.data import amass
    from lemo_tpu.data.stats import GlobalStats
    from lemo_tpu.ops.signal import reflect_pad_dt, unpad_dt
    from lemo_tpu.priors.conv_ae import (load_state_dict_npz,
                                         load_torch_state_dict,
                                         smooth_dec_forward,
                                         smooth_enc_forward)

    def load_any(p):
        return (load_torch_state_dict(p) if p.endswith(".pkl")
                else load_state_dict_npz(p))

    enc, dec = load_any(args.enc_path), load_any(args.dec_path)
    stats = GlobalStats.load(args.stats_path)

    import os
    smplx_model_path = os.path.join(args.body_model_path, "smplx_model")
    if not os.path.isdir(smplx_model_path):
        smplx_model_path = args.body_model_path
    builder = amass.AmassRepresentationBuilder(smplx_model_path,
                                               with_hand=args.with_hand)
    clips = amass.scan_amass(amass.AMASS_TEST_DATASETS, args.amass_dir,
                             args.clip_seconds)[: args.num_clips]
    images, _ = amass.build_dataset(builder, clips, "global_markers",
                                    args.clip_seconds)
    images = np.asarray(stats.normalize(jnp.asarray(images)))

    errors = []
    for img in images:
        x = jnp.asarray(img.T)[None, None]  # [1, 1, d, T]
        v = x[..., 1:] - x[..., :-1]
        vp_ = reflect_pad_dt(v)
        z, sizes = smooth_enc_forward(enc, vp_)
        rec = smooth_dec_forward(dec, z, sizes)
        rec = unpad_dt(rec)
        # integrate velocities back from frame 0 (test_smooth_prior.py:133)
        rec_clip = jnp.cumsum(
            jnp.concatenate([x[..., :1], rec], axis=-1), axis=-1)
        err = float(jnp.abs(rec_clip - x).mean())
        errors.append(err)
        print(f"clip rec error (normalized units): {err:.4f}")
    print(f"mean: {np.mean(errors):.4f}")
    return errors


if __name__ == "__main__":
    main()
