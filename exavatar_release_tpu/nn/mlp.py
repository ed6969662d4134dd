"""Linear / GroupNorm / ReLU stacks as pure param-pytree functions.

Equivalent of the reference's ``make_linear_layers`` (reference
avatar/common/nets/layer.py:9-20: Linear -> GroupNorm(4 groups) -> ReLU,
no activation after the last layer unless ``relu_final``). Params are a
plain pytree so optax schedules address them by name and the whole MLP
fuses under jit; matmuls are (N, C_in) @ (C_in, C_out) MXU work.

Init matches torch defaults (kaiming-uniform bound 1/sqrt(fan_in)) so the
warmup dynamics — which the reference's scale clamp exists for
(avatar/main/model.py:90-97) — behave comparably.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class MLPParams(NamedTuple):
    weights: Tuple[jnp.ndarray, ...]  # each (C_in, C_out)
    biases: Tuple[jnp.ndarray, ...]  # each (C_out,)
    gn_scales: Tuple[jnp.ndarray, ...]  # () placeholder or (C_out,)
    gn_biases: Tuple[jnp.ndarray, ...]


def init_mlp(
    key: jax.Array,
    feat_dims: Sequence[int],
    relu_final: bool = True,
    use_gn: bool = False,
    dtype=jnp.float32,
) -> MLPParams:
    """Build params for ``make_linear_layers(feat_dims, relu_final, use_gn)``."""
    ws: List[jnp.ndarray] = []
    bs: List[jnp.ndarray] = []
    gs: List[jnp.ndarray] = []
    gb: List[jnp.ndarray] = []
    n = len(feat_dims) - 1
    keys = jax.random.split(key, 2 * n)
    for i in range(n):
        fan_in = feat_dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        ws.append(
            jax.random.uniform(
                keys[2 * i], (feat_dims[i], feat_dims[i + 1]), dtype, -bound, bound
            )
        )
        bs.append(
            jax.random.uniform(
                keys[2 * i + 1], (feat_dims[i + 1],), dtype, -bound, bound
            )
        )
        has_act = i < n - 1 or relu_final
        if has_act and use_gn:
            gs.append(jnp.ones((feat_dims[i + 1],), dtype))
            gb.append(jnp.zeros((feat_dims[i + 1],), dtype))
        else:
            gs.append(jnp.zeros((0,), dtype))
            gb.append(jnp.zeros((0,), dtype))
    return MLPParams(tuple(ws), tuple(bs), tuple(gs), tuple(gb))


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 4,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """torch nn.GroupNorm semantics on (N, C) features."""
    N, C = x.shape
    g = x.reshape(N, num_groups, C // num_groups)
    mu = jnp.mean(g, axis=2, keepdims=True)
    var = jnp.var(g, axis=2, keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(N, C) * scale[None, :] + bias[None, :]


def apply_mlp(
    params: MLPParams,
    x: jnp.ndarray,
    relu_final: bool = True,
    use_gn: bool = False,
    num_groups: int = 4,
) -> jnp.ndarray:
    """Forward (N, C_in) -> (N, C_out) matching the reference stack order
    (Linear, then GroupNorm, then ReLU on every non-final layer)."""
    n = len(params.weights)
    for i in range(n):
        x = jnp.dot(x, params.weights[i], preferred_element_type=jnp.float32)
        x = x + params.biases[i][None, :]
        has_act = i < n - 1 or relu_final
        if has_act:
            if use_gn:
                x = group_norm(x, params.gn_scales[i], params.gn_biases[i], num_groups)
            x = jax.nn.relu(x)
    return x
