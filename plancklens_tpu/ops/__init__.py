from . import gauleg, wigner, lensed_cls, n1kern, cg, lensing
