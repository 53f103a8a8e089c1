"""Quadrature rules (include/mitsuba/core/quad.h analog)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gauss_legendre(n: int):
    """Gauss-Legendre nodes/weights on [-1, 1] (quad.h ``gauss_legendre``)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def gauss_lobatto(n: int):
    """Gauss-Lobatto nodes/weights on [-1, 1] (quad.h ``gauss_lobatto``)."""
    if n < 2:
        raise ValueError("gauss_lobatto needs n >= 2")
    # interior nodes: roots of P'_{n-1}; via eigenvalues of the Jacobi matrix
    # of the (1,1) Jacobi polynomials
    if n == 2:
        x = np.array([-1.0, 1.0])
    else:
        # interior nodes: the n-2 roots of P'_{n-1} = roots of the degree
        # (n-2) Jacobi(1,1) polynomial -> eigenvalues of its Jacobi matrix
        k = np.arange(1, n - 2)
        b = np.sqrt(k * (k + 2.0) / ((2 * k + 1) * (2 * k + 3)))
        J = np.diag(b, 1) + np.diag(b, -1)
        interior = np.sort(np.linalg.eigvalsh(J))
        x = np.concatenate([[-1.0], interior, [1.0]])
    Pn = np.polynomial.legendre.Legendre.basis(n - 1)(x)
    w = 2.0 / (n * (n - 1) * Pn ** 2)
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)


def composite_simpson(n: int):
    """Composite Simpson nodes/weights on [-1, 1] (quad.h)."""
    if n % 2 == 0:
        n += 1
    x = np.linspace(-1.0, 1.0, n)
    h = 2.0 / (n - 1)
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    w *= h / 3.0
    return jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32)
