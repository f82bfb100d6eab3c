from . import spin, qe, qresp, nhl, n0s, sims, filt, qest, qecl, cinv, n1, bandpowers, patchy, freq_weighting
