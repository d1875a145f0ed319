"""Static body-parameter priors (temp_prox/prior.py:36-231).

- L2: sum of squares (the prior type LEMO's shipped configs use for body,
  hands, jaw, expression — cfg PROXD_temp_S2.yaml:143-146);
- angle: exponential bending prior on elbows/knees (prior.py:53-89);
- gmm: max-of-mixtures negative log likelihood over body pose
  (prior.py:100-231), parameters loadable from the pickled sklearn GMM the
  SMPLify-X ecosystem ships.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# rotation components of left-elbow / right-elbow / left-knee / right-knee
# within the 63-d body pose (prior.py:58-62, idx - 3 for no global pose)
_ANGLE_IDX = jnp.asarray([55 - 3, 58 - 3, 12 - 3, 15 - 3])
_ANGLE_SIGN = jnp.asarray([1.0, -1.0, -1.0, -1.0])


def l2_prior(x: jnp.ndarray) -> jnp.ndarray:
    """sum(x^2) (prior.py:92-97)."""
    return (x ** 2).sum()


def angle_prior(body_pose: jnp.ndarray) -> jnp.ndarray:
    """body_pose [B, 63] -> [B, 4] exponential bending penalties."""
    return jnp.exp(body_pose[:, _ANGLE_IDX] * _ANGLE_SIGN)


class MaxMixturePrior:
    """GMM negative log likelihood, merged form (prior.py:181-196)."""

    def __init__(self, means: np.ndarray, covs: np.ndarray,
                 weights: np.ndarray, epsilon: float = 1e-16):
        self.means = jnp.asarray(means, jnp.float32)          # [K, D]
        precisions = np.stack([np.linalg.inv(c) for c in covs])
        self.precisions = jnp.asarray(precisions, jnp.float32)  # [K, D, D]
        sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
        const = (2 * np.pi) ** (covs.shape[1] / 2.0)
        nll_weights = weights / (const * (sqrdets / sqrdets.min()))
        self.nll_weights = jnp.asarray(nll_weights, jnp.float32)  # [K]

    @classmethod
    def from_pickle(cls, path: str) -> "MaxMixturePrior":
        import pickle

        with open(path, "rb") as fh:
            gmm = pickle.load(fh, encoding="latin1")
        if isinstance(gmm, dict):
            return cls(gmm["means"], gmm["covars"], gmm["weights"])
        return cls(gmm.means_, gmm.covars_, gmm.weights_)

    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        """pose [B, D] -> [B] min-component weighted NLL."""
        diff = pose[:, None, :] - self.means[None]  # [B, K, D]
        quad = jnp.einsum("bkd,kde,bke->bk", diff, self.precisions, diff)
        ll = 0.5 * quad - jnp.log(self.nll_weights)[None]
        return ll.min(axis=1)


def create_prior(prior_type: str, **kwargs):
    """Factory matching temp_prox/prior.py:36-50.

    For ``gmm``, pass either ``gmm_path`` directly or the reference's
    ``prior_folder`` + ``num_gaussians`` pair (the pickle is then
    ``<prior_folder>/gmm_{num_gaussians:02d}.pkl``, prior.py:119-121)."""
    if prior_type == "l2":
        return l2_prior
    if prior_type == "angle":
        return angle_prior
    if prior_type == "gmm":
        path = kwargs.get("gmm_path")
        if not path:
            import os.path as osp

            folder = kwargs.get("prior_folder", "priors")
            n = int(kwargs.get("num_gaussians", 8))
            path = osp.join(osp.expandvars(folder), f"gmm_{n:02d}.pkl")
        return MaxMixturePrior.from_pickle(path)
    if prior_type in (None, "none"):
        return lambda *a, **k: 0.0
    raise ValueError(prior_type)
