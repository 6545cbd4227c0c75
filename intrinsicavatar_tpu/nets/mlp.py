"""Functional MLP zoo with the reference's initializations.

Equivalents of `models/network_utils.py:201-431` (taconite/IntrinsicAvatar):

  * :class:`VanillaMLP`   — plain ReLU MLP, or SDF MLP with geometric
    "sphere" initialization + Softplus(beta=100) + weight normalization.
  * :class:`VanillaCondMLP` — skip-connection MLP with conditional input
    concatenated at chosen layers (geometric init variant included).
  * :class:`LipschitzMLP` — per-layer learnable Lipschitz bound with
    row-sum weight normalization (Liu et al. 2022), used by the material head.

Each class is a *static* description; parameters are explicit pytrees from
``init(key)`` and applied with ``__call__(params, x)``.  Weights are stored
``[in, out]`` (JAX convention; the reference's torch ``[out, in]`` init
recipes are transposed accordingly).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from intrinsicavatar_tpu.ops.math import get_activation


def _matmul(x, w):
    """Matmul honoring the scoped compute dtype (bf16 in, f32 accumulate
    on the MXU — the TPU analog of tcnn's fp16 fused MLP)."""
    from intrinsicavatar_tpu.ops import precision
    d = precision.current_dtype()
    if d is not None:
        return jax.lax.dot(x.astype(d), w.astype(d),
                           preferred_element_type=jnp.float32)
    return x @ w


def _linear(params, x):
    return _matmul(x, params["w"]) + params["b"]


def _weight_norm(params, x):
    v = params["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
    w = params["g"] * v / jnp.maximum(norm, 1e-12)
    return _matmul(x, w) + params["b"]


def _softplus100(x):
    # Softplus with beta=100: numerically = relu for |x| >~ 0.2
    return jax.nn.softplus(100.0 * x) / 100.0


class VanillaMLP:
    """ReLU/Softplus MLP; sphere-init makes the raw output an approximate
    signed distance to a sphere of ``sphere_init_radius``
    (`models/network_utils.py:201-244`)."""

    def __init__(self, dim_in: int, dim_out: int, n_neurons: int = 64,
                 n_hidden_layers: int = 1, sphere_init: bool = False,
                 sphere_init_radius: float = 0.5, weight_norm: bool = False,
                 output_activation=None):
        self.dim_in, self.dim_out = dim_in, dim_out
        self.n_neurons, self.n_hidden_layers = n_neurons, n_hidden_layers
        self.sphere_init = sphere_init
        self.sphere_init_radius = sphere_init_radius
        self.weight_norm = weight_norm
        self.output_activation = get_activation(output_activation)
        dims = [dim_in] + [n_neurons] * n_hidden_layers + [dim_out]
        self.dims = dims

    def init(self, key: jax.Array):
        params = []
        n = len(self.dims) - 1
        keys = jax.random.split(key, n)
        for i in range(n):
            d_in, d_out = self.dims[i], self.dims[i + 1]
            is_first, is_last = i == 0, i == n - 1
            if self.sphere_init:
                if is_last:
                    w = jax.random.normal(keys[i], (d_in, d_out)) * 1e-4 \
                        + math.sqrt(math.pi) / math.sqrt(d_in)
                    b = jnp.full((d_out,), -self.sphere_init_radius)
                elif is_first:
                    w = jnp.zeros((d_in, d_out))
                    w = w.at[:3].set(
                        jax.random.normal(keys[i], (min(3, d_in), d_out))
                        * math.sqrt(2) / math.sqrt(d_out))
                    b = jnp.zeros((d_out,))
                else:
                    w = jax.random.normal(keys[i], (d_in, d_out)) \
                        * math.sqrt(2) / math.sqrt(d_out)
                    b = jnp.zeros((d_out,))
            else:
                # torch kaiming_uniform for relu: U(+-sqrt(6/fan_in))
                bound = math.sqrt(6.0 / d_in)
                w = jax.random.uniform(keys[i], (d_in, d_out),
                                       minval=-bound, maxval=bound)
                b = jnp.zeros((d_out,))
            if self.weight_norm:
                g = jnp.linalg.norm(w, axis=0, keepdims=True)
                params.append({"v": w, "g": g, "b": b})
            else:
                params.append({"w": w, "b": b})
        return params

    def __call__(self, params, x):
        act = _softplus100 if self.sphere_init else jax.nn.relu
        lin = _weight_norm if self.weight_norm else _linear
        n = len(params)
        for i, p in enumerate(params):
            x = lin(p, x)
            if i < n - 1:
                x = act(x)
        return self.output_activation(x)

    def _effective_w(self, p):
        if self.weight_norm:
            v = p["v"]
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            return p["g"] * v / jnp.maximum(norm, 1e-12)
        return p["w"]

    def value_and_input_grad(self, params, x, out_channel: int = 0):
        """Forward pass + d out[..., out_channel] / d input by *manual*
        backprop (explicit matmuls/elementwise, no jax.grad).

        The XLA:TPU backend miscompiles (SIGILL in the fusion cost model)
        the double-transposed dot_generals that jax's grad-of-grad emits
        when a training loss differentiates through an inner ``jax.grad`` of
        an MLP; writing the input-gradient as a first-order expression
        avoids the pattern entirely.  Assumes no output activation on
        channel ``out_channel`` (true for the SDF head).

        Returns ``(out [N, dim_out], grad [N, dim_in])``.
        """
        act = _softplus100 if self.sphere_init else jax.nn.relu
        n = len(params)
        ws = [self._effective_w(p) for p in params]
        z = x
        pre = []
        for i in range(n - 1):
            h = _matmul(z, ws[i]) + params[i]["b"]
            pre.append(h)
            z = act(h)
        out = _matmul(z, ws[-1]) + params[-1]["b"]

        # reverse pass for channel `out_channel` (matmuls honor the
        # scoped compute dtype like the forward — the manual backprop is
        # part of the *forward* shading computation at eval)
        g = jnp.broadcast_to(ws[-1][:, out_channel][None, :],
                             (x.shape[0], ws[-1].shape[0]))
        for i in range(n - 2, -1, -1):
            if self.sphere_init:
                dact = jax.nn.sigmoid(100.0 * pre[i])
            else:
                dact = (pre[i] > 0).astype(x.dtype)
            g = _matmul(g * dact, ws[i].T)
        return self.output_activation(out), g


class VanillaCondMLP:
    """Skip + conditional-input MLP (`models/network_utils.py:247-357`).

    ``skip_in`` layers re-concatenate the input (divided by sqrt(2));
    ``cond_in`` layers concatenate the conditioning vector.  Geometric init
    zeroes the weights touching encoding/cond channels so the network starts
    as a near-sphere SDF in xyz only.
    """

    def __init__(self, dim_in: int, dim_out: int, dim_cond: int = 0,
                 n_neurons: int = 256, n_hidden_layers: int = 8,
                 skip_in: Sequence[int] = (), cond_in: Sequence[int] = (),
                 sphere_init: bool = False, sphere_init_radius: float = 0.5,
                 last_layer_init: bool = True, last_layer_zeros: bool = False,
                 weight_norm: bool = False):
        self.dim_in, self.dim_out, self.dim_cond = dim_in, dim_out, dim_cond
        self.skip_in, self.cond_in = tuple(skip_in), tuple(cond_in)
        self.sphere_init = sphere_init
        self.sphere_init_radius = sphere_init_radius
        self.last_layer_init = last_layer_init
        self.last_layer_zeros = last_layer_zeros
        self.weight_norm = weight_norm
        dims = [dim_in] + [n_neurons] * n_hidden_layers + [dim_out]
        self.dims = dims
        self.num_layers = len(dims)

    def _layer_dims(self, l: int):
        d_in = self.dims[l]
        if l in self.cond_in:
            d_in += self.dim_cond
        d_out = self.dims[l + 1]
        if l + 1 in self.skip_in:
            d_out -= self.dims[0]
        return d_in, d_out

    def init(self, key: jax.Array):
        params = []
        keys = jax.random.split(key, self.num_layers - 1)
        for l in range(self.num_layers - 1):
            d_in, d_out = self._layer_dims(l)
            if self.sphere_init:
                if self.last_layer_init and l == self.num_layers - 2:
                    w = jax.random.normal(keys[l], (d_in, d_out)) * 1e-4 \
                        + math.sqrt(math.pi) / math.sqrt(self.dims[l])
                    b = jnp.full((d_out,), -self.sphere_init_radius)
                elif l == 0:
                    w = jnp.zeros((d_in, d_out))
                    w = w.at[:3].set(jax.random.normal(keys[l], (3, d_out))
                                     * math.sqrt(2) / math.sqrt(d_out))
                    b = jnp.zeros((d_out,))
                else:
                    w = jax.random.normal(keys[l], (d_in, d_out)) \
                        * math.sqrt(2) / math.sqrt(d_out)
                    if l in self.skip_in:
                        w = w.at[-(self.dims[0] - 3):].set(0.0)
                    if l in self.cond_in and self.dim_cond > 0:
                        w = w.at[-self.dim_cond:].set(0.0)
                    b = jnp.zeros((d_out,))
            elif self.last_layer_zeros and l == self.num_layers - 2:
                w = jax.random.uniform(keys[l], (d_in, d_out),
                                       minval=-1e-5, maxval=1e-5)
                b = jnp.zeros((d_out,))
            else:
                bound = math.sqrt(6.0 / d_in)
                w = jax.random.uniform(keys[l], (d_in, d_out),
                                       minval=-bound, maxval=bound)
                b = jnp.zeros((d_out,))
            if self.weight_norm:
                g = jnp.linalg.norm(w, axis=0, keepdims=True)
                params.append({"v": w, "g": g, "b": b})
            else:
                params.append({"w": w, "b": b})
        return params

    def __call__(self, params, x, cond=None):
        act = _softplus100 if self.sphere_init else jax.nn.relu
        lin = _weight_norm if self.weight_norm else _linear
        coords = x
        if cond is not None and cond.ndim == 1:
            cond = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
        for l in range(self.num_layers - 1):
            if l in self.cond_in:
                x = jnp.concatenate([x, cond], axis=-1)
            if l in self.skip_in:
                x = jnp.concatenate([x, coords], axis=-1) / math.sqrt(2)
            x = lin(params[l], x)
            if l < self.num_layers - 2:
                x = act(x)
        return x


class LipschitzMLP:
    """MLP with learnable per-layer Lipschitz bound
    (`models/network_utils.py:360-431`).

    Each layer's weight rows are rescaled so their L1 row-sum stays below
    ``softplus(c_i)``; the product of the bounds is returned as the
    ``lipshitz_bound`` regularizer.
    """

    def __init__(self, dim_in: int, dim_out: int, n_neurons: int = 64,
                 n_hidden_layers: int = 2, output_activation=None):
        self.dims = [dim_in] + [n_neurons] * n_hidden_layers + [dim_out]
        self.output_activation = get_activation(output_activation)

    def init(self, key: jax.Array):
        params = []
        n = len(self.dims) - 1
        keys = jax.random.split(key, n)
        for i in range(n):
            d_in, d_out = self.dims[i], self.dims[i + 1]
            # torch default Linear init: kaiming_uniform(a=sqrt(5))
            bound = 1.0 / math.sqrt(d_in)
            w = jax.random.uniform(keys[i], (d_in, d_out),
                                   minval=-bound, maxval=bound)
            b = jax.random.uniform(jax.random.fold_in(keys[i], 1), (d_out,),
                                   minval=-bound, maxval=bound)
            # row-sum over inputs per output unit; c init = 2 * max row sum
            max_w = jnp.max(jnp.sum(jnp.abs(w), axis=0))
            params.append({"w": w, "b": b, "c": jnp.ones((1,)) * max_w * 2.0})
        return params

    @staticmethod
    def _normalized(p):
        sp_c = jax.nn.softplus(p["c"])
        absrowsum = jnp.sum(jnp.abs(p["w"]), axis=0)          # per output unit
        scale = jnp.minimum(sp_c / absrowsum, 1.0)
        return p["w"] * scale[None, :]

    def __call__(self, params, x):
        n = len(params)
        for i, p in enumerate(params):
            x = x @ self._normalized(p) + p["b"]
            if i < n - 1:
                x = jax.nn.relu(x)
        return self.output_activation(x)

    def lipschitz_bound_full(self, params):
        bound = 1.0
        for p in params:
            bound = bound * jax.nn.softplus(p["c"])
        return jnp.mean(bound)


def make_mlp(dim_in: int, dim_out: int, config):
    """Factory mirroring ``get_mlp`` (`models/network_utils.py:468-483`)."""
    otype = config.get("otype", "VanillaMLP")
    if otype == "VanillaMLP":
        return VanillaMLP(
            dim_in, dim_out,
            n_neurons=config.get("n_neurons", 64),
            n_hidden_layers=config.get("n_hidden_layers", 1),
            sphere_init=config.get("sphere_init", False),
            sphere_init_radius=config.get("sphere_init_radius", 0.5),
            weight_norm=config.get("weight_norm", False),
            output_activation=config.get("output_activation"),
        )
    if otype == "LipshitzMLP" or otype == "LipschitzMLP":
        return LipschitzMLP(
            dim_in, dim_out,
            n_neurons=config.get("n_neurons", 64),
            n_hidden_layers=config.get("n_hidden_layers", 2),
            output_activation=config.get("output_activation"),
        )
    if otype == "VanillaCondMLP":
        return VanillaCondMLP(
            dim_in, dim_out,
            dim_cond=config.get("dim_cond", 0),
            n_neurons=config.get("n_neurons", 256),
            n_hidden_layers=config.get("n_hidden_layers", 8),
            skip_in=config.get("skip_in", ()),
            cond_in=config.get("cond_in", ()),
            sphere_init=config.get("sphere_init", False),
            sphere_init_radius=config.get("sphere_init_radius", 0.5),
            last_layer_init=config.get("last_layer_init", True),
            last_layer_zeros=config.get("last_layer_zeros", False),
            weight_norm=config.get("weight_norm", False),
        )
    raise ValueError(f"unknown mlp otype {otype!r}")
