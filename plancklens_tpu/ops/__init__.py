from . import gauleg, wigner
