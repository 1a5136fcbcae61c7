from .loop_matrices import m13_matrices, m22_matrices, mpc, mu_coeff, legendre_weights
