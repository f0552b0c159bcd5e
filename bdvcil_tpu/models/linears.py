"""PyCIL-style classifier heads (capability parity with
libs/models/cil_heads/linears.py:11-170).

The live classifier map in the reference only uses IncrementalNet and LSC
(tsm.py:15-18; both in heads.py here), but the vendored PyCIL heads are part
of the public surface, so functional equivalents are provided:

  * ``SimpleLinear``      — linear with kaiming-uniform init (:11-37)
  * ``CosineLinear``      — cosine classifier with optional learnable sigma
                            scaling (:40-84)
  * ``SplitCosineLinear`` — old/new-class split cosine classifier whose halves
                            share one sigma (:87-123)
  * ``reduce_proxies``    — softmax-weighted proxy reduction (:126-136)
  * ``nca_loss``          — the PyCIL NCA variant (:139-170); the live path
                            uses losses.lsc_nca_loss
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses import lsc_nca_loss
from .heads import kaiming_normal_linear, kaiming_uniform_linear


def reduce_proxies(similarities: jax.Array, nb_proxies: int) -> jax.Array:
    """(B, C*P) proxy similarities -> (B, C) softmax-weighted reduction."""
    if nb_proxies == 1:
        return similarities
    b = similarities.shape[0]
    sims = similarities.reshape(b, -1, nb_proxies)
    attention = jax.nn.softmax(sims, axis=-1)
    return jnp.sum(attention * sims, axis=-1)


class SimpleLinear(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param(
            "weight", kaiming_uniform_linear, (self.out_features, x.shape[-1])
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return x @ weight.T + bias


class CosineLinear(nn.Module):
    out_features: int
    nb_proxies: int = 1
    to_reduce: bool = False
    sigma: bool = True  # learnable temperature on the similarities

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param(
            "weight",
            kaiming_normal_linear,
            (self.out_features * self.nb_proxies, x.shape[-1]),
        )
        x_n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w_n = weight / jnp.maximum(jnp.linalg.norm(weight, axis=-1, keepdims=True), 1e-12)
        out = x_n @ w_n.T
        if self.to_reduce:
            out = reduce_proxies(out, self.nb_proxies)
        if self.sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma.reshape(()) * out
        return out


class SplitCosineLinear(nn.Module):
    """Two cosine sub-classifiers (old classes, new classes) sharing a sigma."""

    out_features1: int
    out_features2: int
    nb_proxies: int = 1
    sigma: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out1 = CosineLinear(self.out_features1, self.nb_proxies, to_reduce=False, sigma=False, name="fc1")(x)
        out2 = CosineLinear(self.out_features2, self.nb_proxies, to_reduce=False, sigma=False, name="fc2")(x)
        out = jnp.concatenate([out1, out2], axis=-1)
        out = reduce_proxies(out, self.nb_proxies)
        if self.sigma:
            sigma = self.param("sigma", nn.initializers.ones, (1,))
            out = sigma.reshape(()) * out
        return out


def nca_loss(
    similarities: jax.Array,
    targets: jax.Array,
    scale: float = 1.0,
    margin: float = 0.6,
    class_weights: Optional[jax.Array] = None,
    exclude_pos_denominator: bool = True,
    hinge_proxynca: bool = True,
) -> jax.Array:
    """PyCIL NCA with a fixed scale (the live path uses the learnable-eta
    variant, losses.lsc_nca_loss)."""
    return lsc_nca_loss(
        similarities,
        targets,
        jnp.asarray([scale]),
        margin=margin,
        exclude_pos_denominator=exclude_pos_denominator,
        hinge_proxynca=hinge_proxynca,
        class_weights=class_weights,
    )
