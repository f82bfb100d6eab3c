from . import spin, qe, qresp, nhl
