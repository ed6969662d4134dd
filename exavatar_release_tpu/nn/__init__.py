"""Minimal pure-pytree neural-net layers for the avatar MLP heads."""
from .mlp import MLPParams, init_mlp, apply_mlp, group_norm

__all__ = ["MLPParams", "init_mlp", "apply_mlp", "group_norm"]
