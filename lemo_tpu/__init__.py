"""lemo_tpu — a TPU-native (JAX/XLA/Pallas) framework for learned-motion-prior
human body capture, re-built from scratch with the capability surface of
sanweiliti/LEMO ("Learning Motion Priors for 4D Human Body Capture in 3D
Scenes", ICCV 2021).

Subsystems
----------
- :mod:`lemo_tpu.body_model`   SMPL/SMPL-H/SMPL-X/MANO forward as pure JAX
  functions (LBS, blend shapes, PCA hands, landmark regression) plus the
  VPoser pose prior.
- :mod:`lemo_tpu.ops`          geometry / signal kernels: rotations,
  quaternions, Chamfer nearest-neighbour (Pallas), SDF trilinear sampling,
  visibility, self-intersection, robustifiers.
- :mod:`lemo_tpu.priors`       convolutional motion priors (smoothness
  encoder/decoder and occlusion-infilling auto-encoder) as pure functions
  over torch-layout parameter pytrees, with checkpoint converters.
- :mod:`lemo_tpu.data`         AMASS / PROX data plumbing and the "motion
  image" body representations with their normalization statistics.
- :mod:`lemo_tpu.fitting`      gradient-based fitting pipelines: AMASS
  per-frame, AMASS temporal, and the PROX sliding-window SMPLify-style
  fitter with scene-interaction losses.
- :mod:`lemo_tpu.train`        training loops for the motion priors.
- :mod:`lemo_tpu.parallel`     device-mesh sharding utilities (pjit /
  shard_map) for multi-chip scaling.

Design: the compute core is functional — body models and losses are pure
functions over parameter pytrees, optimizers are optax transformations
rolled with ``lax.scan`` under a single ``jit``. There is no stateful
Module graph; "frozen vs optimized" splits are pytree partitions.
"""

__version__ = "0.1.0"
