"""Import the reference eftpipe implementation as a test oracle.

The reference at /root/reference is pure Python (NumPy/SciPy) but imports
Cobaya for logging/MPI plumbing, which is not installed here.  We stub the
tiny surface it actually touches and expose the reference modules under the
``ref_eftpipe`` package name.  Tests that need the oracle call
``load_reference()`` and are skipped when the reference tree is absent.

Nothing from the reference is ever imported by the framework itself — this
module lives in tests/ only.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import os

REFERENCE_ROOT = Path(os.environ.get("EFTPIPE_REF_ROOT", "/root/reference"))


def _install_cobaya_stub() -> None:
    if "cobaya" in sys.modules:
        return

    cobaya = types.ModuleType("cobaya")
    log = types.ModuleType("cobaya.log")
    mpi = types.ModuleType("cobaya.mpi")

    class HasLogger:
        def set_logger(self, lowercase=True, name=None):
            import logging

            self.log = logging.getLogger(name or type(self).__name__)

        def _noop(self, *args, **kwargs):
            pass

        mpi_info = mpi_warning = mpi_debug = mpi_error = _noop

    class LoggedError(Exception):
        def __init__(self, logger, msg="", *args):
            super().__init__(msg % args if args else msg)

    def logger_setup(*args, **kwargs):
        pass

    def is_main_process():
        return True

    def root_only(fn):
        return fn

    log.HasLogger = HasLogger
    log.LoggedError = LoggedError
    log.logger_setup = logger_setup
    mpi.is_main_process = is_main_process
    mpi.root_only = root_only
    cobaya.log = log
    cobaya.mpi = mpi
    sys.modules["cobaya"] = cobaya
    sys.modules["cobaya.log"] = log
    sys.modules["cobaya.mpi"] = mpi


def _install_ref_package() -> None:
    if "ref_eftpipe" in sys.modules:
        return
    pkg = types.ModuleType("ref_eftpipe")
    pkg.__path__ = [str(REFERENCE_ROOT / "eftpipe")]
    pkg.__package__ = "ref_eftpipe"
    sys.modules["ref_eftpipe"] = pkg


def _patch_scipy_compat() -> None:
    """The reference uses scipy.interpolate.interp2d (removed in SciPy 1.14,
    eftpipe/fftlog2d.py) — provide a RectBivariateSpline-backed shim so the
    oracle can run on the installed SciPy."""
    import numpy as np
    import scipy.interpolate as si

    try:
        si.interp2d(np.arange(4.0), np.arange(4.0), np.zeros((4, 4)))
        return  # old scipy: native interp2d still works
    except NotImplementedError:
        pass
    except Exception:
        return

    class _Interp2dShim:
        def __init__(self, x, y, z, kind="linear", copy=True,
                     bounds_error=False, fill_value=None):
            from scipy.interpolate import RectBivariateSpline

            k = {"linear": 1, "cubic": 3, "quintic": 5}[kind]
            # interp2d: z indexed (y, x); RectBivariateSpline: z indexed (x, y)
            self._sp = RectBivariateSpline(
                np.asarray(y), np.asarray(x), np.asarray(z), kx=k, ky=k
            )

        def __call__(self, x, y):
            out = self._sp(np.atleast_1d(y), np.atleast_1d(x))
            return out

    si.interp2d = _Interp2dShim


def reference_available() -> bool:
    return (REFERENCE_ROOT / "eftpipe" / "pybird" / "pybird.py").exists()


GOLDEN_DIR = Path(__file__).resolve().parent / "goldens"


def golden_oracle(name: str, compute):
    """Hermetic-golden layer over the live reference oracle.

    ``compute`` produces a flat ``dict[str, np.ndarray]`` of reference-side
    outputs at *deterministic* inputs.  When the reference tree is mounted the
    dict is computed live (and written to ``tests/goldens/<name>.npz`` when
    the env var ``RECORD_GOLDENS`` is set — run ``RECORD_GOLDENS=1 pytest``
    once to refresh).  When the reference is absent the committed golden file
    is loaded instead, so the parity gates keep running on machines without
    ``/root/reference`` (the reference's own committed-regression pattern,
    /root/reference/tests/regression/test_likelihood.py:8-112).
    """
    import os

    import numpy as np
    import pytest

    path = GOLDEN_DIR / f"{name}.npz"
    if reference_available():
        out = {k: np.asarray(v) for k, v in compute().items()}
        if os.environ.get("RECORD_GOLDENS"):
            GOLDEN_DIR.mkdir(exist_ok=True)
            tmp = path.with_suffix(".tmp.npz")
            np.savez_compressed(tmp, **out)
            tmp.replace(path)
        return out
    if path.exists():
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    pytest.skip(f"neither reference nor golden {path.name} available")


def load_reference(module: str):
    """Import e.g. ``load_reference("pybird.pybird")`` from the reference tree."""
    import importlib
    import pytest

    if not reference_available():
        pytest.skip("reference implementation not available")
    _install_cobaya_stub()
    _patch_scipy_compat()
    _install_ref_package()
    return importlib.import_module(f"ref_eftpipe.{module}")
