"""AST-whitelisted evaluation of config expression strings.

The reference evals prior/param lambda strings straight from YAML
(/root/reference/eftpipe/marginal.py:13-19, "eval_callable").  Stripping
``__builtins__`` is not a sandbox — attribute-chain escapes through the
exposed module objects (``np.__loader__``…) remain.  Here the expression is
*parsed* and validated against a whitelist of AST nodes before compilation:

* arithmetic / comparisons / boolean ops / conditional expressions,
* calls and attribute chains rooted at ``np``/``jnp`` (never reaching an
  underscore-prefixed attribute),
* names bound by the lambda itself, plus ``abs``/``min``/``max``.

Anything else (imports, subscripted type tricks, dunder access, walrus,
comprehensions, f-strings, ...) raises ``UnsafeExpressionError`` at config
load time.  This covers every expression the reference's production YAMLs
use (e.g. ``lambda c2, c4: (c2 + c4) / np.sqrt(2.)``).
"""

from __future__ import annotations

import ast

import jax.numpy as jnp


class UnsafeExpressionError(ValueError):
    """A config expression used syntax outside the whitelisted grammar."""


_ALLOWED_NODES = (
    ast.Expression, ast.Lambda, ast.arguments, ast.arg,
    ast.Name, ast.Load, ast.Constant, ast.keyword,
    ast.BinOp, ast.UnaryOp, ast.BoolOp, ast.Compare, ast.IfExp,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.USub, ast.UAdd, ast.And, ast.Or, ast.Not,
    ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Eq, ast.NotEq,
    ast.Call, ast.Attribute, ast.Tuple, ast.List, ast.Subscript, ast.Slice,
)

_MODULE_ROOTS = ("np", "jnp")
_SAFE_BUILTINS = {"abs": abs, "min": min, "max": max}


def _check(node: ast.AST, bound: set[str]) -> None:
    if not isinstance(node, _ALLOWED_NODES):
        raise UnsafeExpressionError(
            f"disallowed syntax {type(node).__name__!r} in config expression"
        )
    if isinstance(node, ast.Attribute):
        # attribute chains must root at np/jnp and never touch _names
        if node.attr.startswith("_"):
            raise UnsafeExpressionError(
                f"underscore attribute {node.attr!r} is not allowed"
            )
        base = node.value
        while isinstance(base, ast.Attribute):
            if base.attr.startswith("_"):
                raise UnsafeExpressionError(
                    f"underscore attribute {base.attr!r} is not allowed"
                )
            base = base.value
        if not (isinstance(base, ast.Name) and base.id in _MODULE_ROOTS):
            raise UnsafeExpressionError(
                "attribute access is only allowed on np/jnp"
            )
    if isinstance(node, ast.Lambda):
        inner = set(bound)
        a = node.args
        if a.vararg or a.kwarg or a.posonlyargs or a.kwonlyargs:
            raise UnsafeExpressionError(
                "only plain positional lambda arguments are allowed"
            )
        inner.update(arg.arg for arg in a.args)
        for child in ast.iter_child_nodes(node):
            _check_tree(child, inner)
        return
    if isinstance(node, ast.Name):
        allowed = bound | set(_MODULE_ROOTS) | set(_SAFE_BUILTINS)
        if node.id not in allowed:
            raise UnsafeExpressionError(
                f"name {node.id!r} is not defined in the expression scope"
            )
    for child in ast.iter_child_nodes(node):
        _check_tree(child, bound)


def _check_tree(node: ast.AST, bound: set[str]) -> None:
    _check(node, bound)


def safe_eval_expr(expr: str):
    """Validate + evaluate a config expression string (typically a lambda).

    Returns the resulting Python object (usually a function closing only
    over np/jnp).  Raises :class:`UnsafeExpressionError` on any syntax or
    name outside the whitelist.
    """
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as e:
        raise UnsafeExpressionError(f"invalid config expression: {e}") from e
    _check_tree(tree, set())
    code = compile(tree, "<config-expr>", "eval")
    # the AST whitelist is the security boundary — the compiled code can
    # only reference validated names.  __import__ must stay reachable in
    # the frame builtins because JAX's C dispatch path resolves lazy
    # imports through the *calling* frame's builtins (empty builtins make
    # the first jnp call die with KeyError '__import__'); the grammar has
    # no import syntax, so the expression itself can never reach it.
    env = {
        "__builtins__": {"__import__": __import__},
        "np": jnp, "jnp": jnp, **_SAFE_BUILTINS,
    }
    return eval(code, env)  # noqa: S307 — grammar validated above
