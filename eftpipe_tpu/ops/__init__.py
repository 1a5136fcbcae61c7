from .fftlog import HostFFTLog, FFTLogPlan, make_plan, fftlog_coef, spectral_window
from .interp import spline_matrix, SplineTable, spline_eval
