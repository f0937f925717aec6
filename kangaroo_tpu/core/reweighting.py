"""IRLS robust-loss weights, mirroring include/kangaroo/reweighting.h:5-35."""
from __future__ import annotations

import jax.numpy as jnp


def weight_sq(r, c=None):
    return jnp.ones_like(jnp.asarray(r, jnp.float32))


def weight_l1(r, c=None):
    return 1.0 / jnp.abs(r)


def weight_huber(r, c):
    absr = jnp.abs(r)
    return jnp.where(absr <= c, 1.0, c / absr)


def weight_tukey(r, c):
    absr = jnp.abs(r)
    roc = r / c
    om = 1.0 - roc * roc
    return jnp.where(absr <= c, om * om, 0.0)


def weight_cauchy(r, c):
    roc = r / c
    return 1.0 / (1.0 + roc * roc)


WEIGHT_FNS = {
    "sq": weight_sq,
    "l1": weight_l1,
    "huber": weight_huber,
    "tukey": weight_tukey,
    "cauchy": weight_cauchy,
}
