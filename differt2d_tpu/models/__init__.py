"""Learnable components built on the ray-tracing substrate.

The reference demonstrates the library as a trainable-RT substrate with a
GFlowNet + DeepSets path-candidate sampler
(``docs/source/notebooks/cost20120_helsinki_model.ipynb``); this package
provides a TPU-first equivalent in flax.
"""

from .gflownet import FlowNet, make_reward_fn, make_train_step, sample_trajectories

__all__ = (
    "FlowNet",
    "make_reward_fn",
    "make_train_step",
    "sample_trajectories",
)
