"""Optimizers (TPU analog of src/python/python/ad/optimizers.py).

Same semantics as the reference: a dict-like container of latent variables;
``step`` takes the gradients and updates in place.  ``Adam`` supports
``mask_updates`` (skip state/variable updates for zero-grad entries) and
``uniform`` (UniformAdam of Nicolet et al. 2021: scalar max of the second
moment) exactly as optimizers.py:204-309.

Unlike Dr.Jit, gradients are not attached to variables; pass them to
``step({key: grad, ...})`` (e.g. from ``jax.grad`` over the render).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


class Optimizer:
    """Dict-like parameter container (optimizers.py:6-110)."""

    def __init__(self, lr: float, params: Optional[Dict] = None):
        self.lr_default = lr
        self.lr: Dict[str, float] = {}
        self.variables: Dict[str, jnp.ndarray] = {}
        self.state: Dict[str, tuple] = {}
        if params:
            for k, v in params.items():
                self[k] = v

    def __contains__(self, key):
        return key in self.variables

    def __getitem__(self, key):
        return self.variables[key]

    def __setitem__(self, key, value):
        value = jnp.asarray(value, jnp.float32)
        needs_reset = (
            key not in self.variables
            or self.variables[key].shape != value.shape
        )
        self.variables[key] = value
        if needs_reset:
            self.reset(key)

    def __delitem__(self, key):
        del self.variables[key]
        self.state.pop(key, None)

    def __len__(self):
        return len(self.variables)

    def keys(self):
        return self.variables.keys()

    def items(self):
        return self.variables.items()

    def set_learning_rate(self, lr, key: Optional[str] = None):
        if key is None:
            self.lr_default = lr
        else:
            self.lr[key] = lr

    def _lr(self, key):
        return self.lr.get(key, self.lr_default)

    def reset(self, key):
        raise NotImplementedError


class SGD(Optimizer):
    """SGD with optional momentum (optimizers.py:112-200)."""

    def __init__(self, lr: float, momentum: float = 0.0,
                 params: Optional[Dict] = None):
        assert 0.0 <= momentum < 1.0
        self.momentum = momentum
        super().__init__(lr, params)

    def reset(self, key):
        v = self.variables[key]
        self.state[key] = (jnp.zeros_like(v),)

    def step(self, grads: Dict[str, jnp.ndarray]):
        for k, g in grads.items():
            if k not in self.variables:
                continue
            g = jnp.nan_to_num(jnp.asarray(g, jnp.float32))
            p = self.variables[k]
            if self.momentum != 0.0:
                (vel,) = self.state[k]
                vel = self.momentum * vel + g
                self.state[k] = (vel,)
                g = vel
            self.variables[k] = p - self._lr(k) * g


class Adam(Optimizer):
    """Adam / UniformAdam with mask_updates (optimizers.py:204-309)."""

    def __init__(self, lr: float, beta_1: float = 0.9, beta_2: float = 0.999,
                 epsilon: float = 1e-8, mask_updates: bool = False,
                 uniform: bool = False, params: Optional[Dict] = None):
        assert 0 <= beta_1 < 1 and 0 <= beta_2 < 1 and lr > 0 and epsilon > 0
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon
        self.mask_updates = mask_updates
        self.uniform = uniform
        self.t: Dict[str, int] = {}
        super().__init__(lr, params)

    def reset(self, key):
        v = self.variables[key]
        self.state[key] = (jnp.zeros_like(v), jnp.zeros_like(v))
        self.t[key] = 0

    def step(self, grads: Dict[str, jnp.ndarray]):
        for k, g in grads.items():
            if k not in self.variables:
                continue
            g = jnp.nan_to_num(jnp.asarray(g, jnp.float32))
            self.t[k] += 1
            t = self.t[k]
            lr_scale = (1 - self.beta_2 ** t) ** 0.5 / (1 - self.beta_1 ** t)
            lr_t = self._lr(k) * lr_scale
            m_tp, v_tp = self.state[k]
            m_t = self.beta_1 * m_tp + (1 - self.beta_1) * g
            v_t = self.beta_2 * v_tp + (1 - self.beta_2) * g * g
            if self.mask_updates:
                nonzero = g != 0.0
                m_t = jnp.where(nonzero, m_t, m_tp)
                v_t = jnp.where(nonzero, v_t, v_tp)
            self.state[k] = (m_t, v_t)
            if self.uniform:
                step = lr_t * m_t / (jnp.sqrt(jnp.max(v_t)) + self.epsilon)
            else:
                step = lr_t * m_t / (jnp.sqrt(v_t) + self.epsilon)
            if self.mask_updates:
                step = jnp.where(nonzero, step, 0.0)
            self.variables[k] = self.variables[k] - step
