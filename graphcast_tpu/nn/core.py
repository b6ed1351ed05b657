"""Minimal functional NN core: explicit param trees, f32 masters.

Replaces the reference's Haiku module system with plain init/apply
dataclasses. Parameters always live in float32 (the "f32 master params /
bf16 activations" policy of the reference's casting.py:155-205 is built in:
``apply`` casts params to the activation dtype, and gradients flow back to
the f32 masters automatically via the cast).

Initialization matches Haiku's defaults (truncated normal with
stddev = 1/sqrt(fan_in) for Linear) so that statistically the models start
from the same distribution as the reference.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Params = dict  # Nested dict of str -> (Params | jnp.ndarray).


def get_activation(name: str) -> Callable:
  """Activation registry (reference: deep_typed_graph_net.py:440-448)."""
  if name == "identity":
    return lambda x: x
  if hasattr(jax.nn, name):
    return getattr(jax.nn, name)
  if hasattr(jnp, name):
    return getattr(jnp, name)
  raise ValueError(f"unknown activation {name!r}")


# Stddev of a standard normal truncated to [-2, 2]; haiku's VarianceScaling
# divides by this so the *sample* stddev hits the target, but its plain
# TruncatedNormal (hk.Linear's default) does not.
TRUNCATED_NORMAL_STDDEV_FACTOR = 0.87962566103423978


def truncated_normal(key, shape, stddev, dtype=jnp.float32):
  # Matches hk.initializers.TruncatedNormal exactly: samples in [-2, 2]
  # stddevs scaled by `stddev` with NO variance correction (actual sample
  # stddev is ~0.8796*stddev). Verified empirically against dm-haiku 0.0.16
  # in tests/test_reference_parity.py.
  unscaled = jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
  return unscaled * stddev


@dataclasses.dataclass(frozen=True)
class Linear:
  """y = x @ w + b with fan-in truncated-normal init (Haiku default)."""
  in_size: int
  out_size: int
  with_bias: bool = True
  init_stddev: Optional[float] = None  # default: 1/sqrt(fan_in)

  def init(self, key) -> Params:
    stddev = self.init_stddev
    if stddev is None:
      stddev = 1.0 / math.sqrt(max(self.in_size, 1))
    p = {"w": truncated_normal(key, (self.in_size, self.out_size), stddev)}
    if self.with_bias:
      p["b"] = jnp.zeros((self.out_size,), jnp.float32)
    return p

  def apply(self, params: Params, x):
    w = params["w"].astype(x.dtype)
    y = x @ w
    if self.with_bias:
      y = y + params["b"].astype(x.dtype)
    return y


@dataclasses.dataclass(frozen=True)
class MLP:
  """MLP with `num_hidden_layers` hidden layers of `hidden_size`.

  Layer naming matches Haiku's hk.nets.MLP ("linear_0", "linear_1", ...) to
  ease parameter conversion from reference checkpoints.
  """
  in_size: int
  hidden_size: int
  num_hidden_layers: int
  out_size: int
  activation: str = "swish"

  def _layers(self):
    sizes = ([self.in_size]
             + [self.hidden_size] * self.num_hidden_layers
             + [self.out_size])
    return [Linear(a, b) for a, b in zip(sizes[:-1], sizes[1:])]

  def init(self, key) -> Params:
    layers = self._layers()
    keys = jax.random.split(key, len(layers))
    return {f"linear_{i}": l.init(k)
            for i, (l, k) in enumerate(zip(layers, keys))}

  def apply(self, params: Params, x):
    act = get_activation(self.activation)
    layers = self._layers()
    for i, layer in enumerate(layers):
      x = layer.apply(params[f"linear_{i}"], x)
      if i + 1 < len(layers):
        x = act(x)
    return x


@dataclasses.dataclass(frozen=True)
class LayerNorm:
  """LayerNorm over the last axis; statistics computed in float32.

  With ``create_scale=create_offset=False`` this is the parameter-free
  normalization used under norm-conditioning
  (reference: deep_typed_graph_net.py:224-236).
  """
  size: int
  create_scale: bool = True
  create_offset: bool = True
  eps: float = 1e-5

  def init(self, key) -> Params:
    del key
    p = {}
    if self.create_scale:
      p["scale"] = jnp.ones((self.size,), jnp.float32)
    if self.create_offset:
      p["offset"] = jnp.zeros((self.size,), jnp.float32)
    return p

  def apply(self, params: Params, x):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
    y = y.astype(dtype)
    if self.create_scale:
      y = y * params["scale"].astype(dtype)
    if self.create_offset:
      y = y + params["offset"].astype(dtype)
    return y


@dataclasses.dataclass(frozen=True)
class NormConditioning:
  """Linear map: conditioning vector → per-channel (scale-1, offset).

  Applied after a parameter-free LayerNorm; initialized near zero so training
  starts at identity (reference: mlp.py:24-45, init stddev 1e-8).
  """
  cond_size: int
  feature_size: int
  init_stddev: float = 1e-8

  def init(self, key) -> Params:
    return Linear(self.cond_size, 2 * self.feature_size,
                  init_stddev=self.init_stddev).init(key)

  def apply(self, params: Params, x, conditioning):
    """x: [..., feature]; conditioning: broadcastable [..., cond_size]."""
    lin = Linear(self.cond_size, 2 * self.feature_size)
    co = lin.apply(params, conditioning.astype(x.dtype))
    scale_minus_one, offset = jnp.split(co, 2, axis=-1)
    return x * (scale_minus_one + 1.0) + offset


@dataclasses.dataclass(frozen=True)
class MLPWithNorm:
  """MLP → optional LayerNorm → optional norm-conditioning.

  The composite update function used everywhere in the typed-graph nets
  (reference: deep_typed_graph_net.py:212-248 build_mlp_with_maybe_layer_norm).
  Inputs passed as multiple arrays are concatenated on the last axis
  (reference: jraph.concatenated_args).
  """
  in_size: int
  hidden_size: int
  num_hidden_layers: int
  out_size: int
  activation: str = "swish"
  use_layer_norm: bool = True
  use_norm_conditioning: bool = False
  norm_conditioning_size: Optional[int] = None

  def __post_init__(self):
    if self.use_norm_conditioning and not self.use_layer_norm:
      raise ValueError("norm conditioning requires layer norm")
    if self.use_norm_conditioning and not self.norm_conditioning_size:
      raise ValueError("norm_conditioning_size required")

  @property
  def _mlp(self):
    return MLP(self.in_size, self.hidden_size, self.num_hidden_layers,
               self.out_size, self.activation)

  @property
  def _ln(self):
    create = not self.use_norm_conditioning
    return LayerNorm(self.out_size, create_scale=create, create_offset=create)

  @property
  def _nc(self):
    return NormConditioning(self.norm_conditioning_size, self.out_size)

  def init(self, key) -> Params:
    k_mlp, k_ln, k_nc = jax.random.split(key, 3)
    p = {"mlp": self._mlp.init(k_mlp)}
    if self.use_layer_norm:
      ln_params = self._ln.init(k_ln)
      if ln_params:  # param-free under norm conditioning: omit, like haiku
        p["layer_norm"] = ln_params
    if self.use_norm_conditioning:
      p["norm_conditioning"] = self._nc.init(k_nc)
    return p

  def apply(self, params: Params, *inputs, global_norm_conditioning=None):
    x = inputs[0] if len(inputs) == 1 else jnp.concatenate(inputs, axis=-1)
    x = self._mlp.apply(params["mlp"], x)
    return self._norm(params, x, global_norm_conditioning)

  def _norm(self, params, x, global_norm_conditioning):
    if self.use_layer_norm:
      x = self._ln.apply(params.get("layer_norm", {}), x)
    if self.use_norm_conditioning:
      if global_norm_conditioning is None:
        raise ValueError("global_norm_conditioning must be passed")
      x = self._nc.apply(params["norm_conditioning"], x,
                         global_norm_conditioning)
    elif global_norm_conditioning is not None:
      raise ValueError("global_norm_conditioning passed but not enabled")
    return x

  def apply_factored_edge_update(self, params: Params, edge_feats,
                                 sender_full, receiver_full, senders,
                                 receivers, global_norm_conditioning=None):
    """Edge update with the first linear layer algebraically factored.

    W₁·concat(e, n_s, n_r) = W₁ᵉ·e + (W₁ˢ·N)[senders] + (W₁ʳ·N)[receivers]:
    the node contributions are projected once per *node* (N rows) instead of
    once per *edge* (E rows, E ≈ 6N on the icosahedral mesh), before the
    gather. Exactly equivalent in exact arithmetic; saves ~2.4× of the
    first-layer FLOPs on the multi-mesh and gathers hidden-size rows.
    """
    p0 = params["mlp"]["linear_0"]
    w = p0["w"].astype(edge_feats.dtype)
    b = p0["b"].astype(edge_feats.dtype)
    le = edge_feats.shape[-1]
    ls = sender_full.shape[-1]
    we, ws, wr = w[:le], w[le:le + ls], w[le + ls:]
    x = (edge_feats @ we
         + (sender_full @ ws)[senders]
         + (receiver_full @ wr)[receivers]
         + b)
    act = get_activation(self.activation)
    layers = self._mlp._layers()
    for i, layer in enumerate(layers[1:], start=1):
      x = act(x)
      x = layer.apply(params["mlp"][f"linear_{i}"], x)
    return self._norm(params, x, global_norm_conditioning)
