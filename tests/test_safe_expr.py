"""Gates for the AST-whitelisted config-expression evaluator
(utils/safe_expr.py) — the hardening of the reference's eval_callable
pattern (marginal.py:13-19): production-YAML lambdas must evaluate, escape
attempts must raise at load time.
"""

import numpy as np
import pytest

from eftpipe_tpu.utils.safe_expr import safe_eval_expr, UnsafeExpressionError


PRODUCTION_EXPRS = [
    # every lambda shape the reference's DR16 YAMLs actually use
    ("lambda c2, c4: (c2 + c4) / np.sqrt(2.)", (1.0, 1.0), np.sqrt(2.0)),
    ("lambda logA: 1e-10*np.exp(logA)", (3.044,), 1e-10 * np.exp(3.044)),
    ("lambda omegam, sigma8: sigma8*np.sqrt(omegam/0.3)", (0.3, 0.8), 0.8),
]


@pytest.mark.parametrize("expr,args,expected", PRODUCTION_EXPRS)
def test_production_lambdas_evaluate(expr, args, expected):
    fn = safe_eval_expr(expr)
    np.testing.assert_allclose(float(fn(*args)), expected, rtol=1e-12)


def test_plain_arithmetic_and_conditionals():
    assert float(safe_eval_expr("lambda x: x**2 + 1 if x > 0 else -x")(2.0)) == 5.0
    assert float(safe_eval_expr("lambda a, b: max(a, b)")(1.0, 3.0)) == 3.0


ESCAPES = [
    "lambda: __import__('os').system('true')",
    "lambda: np.__loader__",
    "lambda x: x.__class__",
    "lambda: np.random.__dict__",
    "lambda: (lambda: 0).__globals__",
    "lambda: open('/etc/passwd')",
    "lambda: [x for x in (1,)]",          # comprehension (scope object)
    "lambda: exec('1')",
    "import os",                          # not even an expression
    "lambda x: getattr(x, 'flags')",
]


@pytest.mark.parametrize("expr", ESCAPES)
def test_escape_attempts_raise(expr):
    with pytest.raises(UnsafeExpressionError):
        safe_eval_expr(expr)


def test_attribute_access_limited_to_np():
    # chains rooted at np/jnp are fine (e.g. np.linalg.norm)
    fn = safe_eval_expr("lambda v: np.linalg.norm(np.asarray([v, v]))")
    np.testing.assert_allclose(float(fn(1.0)), np.sqrt(2.0), rtol=1e-7)
    with pytest.raises(UnsafeExpressionError):
        safe_eval_expr("lambda d: d.values()")
