"""Content hashing and config-drift detection.

Every cached artifact is keyed by a hash dictionary; a rerun with drifted configuration is a
hard error (reference: plancklens/utils.py:115-180).
"""
import hashlib
import numpy as np


def clhash(cl, dtype=np.float16):
    """sha1 of an array cast to low precision (machine-independent).

    Values beyond the f16 range saturate to inf in the cast — deterministic and
    hash-stable (the reference casts the same way, plancklens/utils.py:115-124), so
    the overflow warning is suppressed rather than meaningful.
    """
    with np.errstate(over='ignore'):
        return hashlib.sha1(
            np.ascontiguousarray(np.asarray(cl).astype(dtype))).hexdigest()


def mchash(mc_idxs):
    """Order-independent hash of an integer index array."""
    return hashlib.sha1(np.ascontiguousarray(np.sort(np.asarray(mc_idxs)))).hexdigest()


class HashCheckError(AssertionError):
    pass


def hash_check(hash1, hash2, ignore=('lib_dir', 'prefix'), fn=None):
    """Recursively compare two hash dictionaries; raise on any mismatch."""
    keys1 = [k for k in hash1.keys() if k not in ignore]
    keys2 = [k for k in hash2.keys() if k not in ignore]
    for key in set(keys1).union(keys2):
        if key not in hash1 or key not in hash2:
            raise HashCheckError(f"hash_check: key {key!r} missing on one side ({fn})")
        v1, v2 = hash1[key], hash2[key]
        if isinstance(v1, dict) and isinstance(v2, dict):
            hash_check(v1, v2, ignore=ignore, fn=fn)
        elif isinstance(v1, np.ndarray) or isinstance(v2, np.ndarray):
            if not np.allclose(v1, v2):
                raise HashCheckError(f"hash_check: arrays differ at key {key!r} ({fn})")
        else:
            if not v1 == v2:
                raise HashCheckError(
                    f"hash_check: values differ at key {key!r}: {v1!r} != {v2!r} ({fn})")
