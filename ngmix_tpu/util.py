"""Small utilities: parameter printing and ratio-error propagation.

Behavior parity with ngmix/util.py:5-81; the ratio-error helpers are
implemented with jnp so they are usable inside jitted result builders.
"""
from sys import stdout

import jax.numpy as jnp
import numpy as np


def print_pars(pars, fmt="%8.3g", front=None, stream=stdout, logger=None):
    """print parameters with a uniform width"""
    txt = ""
    if front is not None:
        txt += front + " "
    if pars is None:
        txt += "%s" % None
    else:
        txt += format_pars(pars, fmt=fmt)

    if logger is not None:
        logger.debug(txt)
    else:
        stream.write(txt + "\n")


def format_pars(pars, fmt="%8.3g"):
    """format parameters as one line"""
    fmt = " ".join([fmt + " "] * len(pars))
    return fmt % tuple(np.asarray(pars))


def get_ratio_var(a, b, var_a, var_b, cov_ab):
    """variance of (a/b); jnp, safe for b == 0 (returns +inf)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    bsafe = jnp.where(b == 0, 1.0, b)
    asafe = jnp.where(a == 0, 1.0, a)
    rsq = (a / bsafe) ** 2
    var = rsq * (
        var_a / asafe**2 + var_b / bsafe**2 - 2 * cov_ab / (asafe * bsafe)
    )
    # a == 0 limit: var((a/b)) -> var_a / b^2
    var = jnp.where(a == 0, var_a / bsafe**2, var)
    return jnp.where(b == 0, jnp.inf, var)


def get_ratio_error(a, b, var_a, var_b, cov_ab):
    """error on a/b, clipped at 0"""
    var = get_ratio_var(a, b, var_a, var_b, cov_ab)
    return jnp.sqrt(jnp.clip(var, 0.0, jnp.inf))


def match_vma(x, ref):
    """annotate x as varying over the mesh axes ref varies over.

    jax 0.9's shard_map tracks varying-across-mesh (vma) types: a
    while_loop carry initialized from constants would type-mismatch its
    body output, which inherits vma from the sharded data. Wrap the
    carry pytree with jax.tree.map(lambda v: match_vma(v, <data>), s).
    Only the axes x is missing are added; no-op outside shard_map.
    """
    import jax

    want = set(getattr(jax.typeof(ref), "vma", ()))
    have = set(getattr(jax.typeof(x), "vma", ()))
    need = tuple(want - have)
    if not need:
        return x
    return jax.lax.pcast(x, need, to="varying")
