"""Cacher strategy objects (reference: plancklens/helpers/cachers.py:5-87).

The framework's products are pure functions of configuration + index, so caching is an
optimisation, not a correctness requirement (unlike the reference where the filesystem
cache is the data-exchange mechanism between MPI ranks)."""
import os
import numpy as np


class cacher_none:
    def cache(self, fn, obj):
        pass

    def load(self, fn):
        assert 0, 'nothing cached here'

    def is_cached(self, fn):
        return False


class cacher_mem:
    def __init__(self, maxsize=None):
        self._cache = {}
        self.maxsize = maxsize

    def cache(self, fn, obj):
        if self.maxsize is not None and len(self._cache) >= self.maxsize:
            self._cache.pop(next(iter(self._cache)))
        self._cache[fn] = np.asarray(obj) if not isinstance(obj, tuple) else obj

    def load(self, fn):
        return self._cache[fn]

    def is_cached(self, fn):
        return fn in self._cache


class cacher_npy:
    def __init__(self, lib_dir, verbose=False):
        self.lib_dir = lib_dir
        self.verbose = verbose
        os.makedirs(lib_dir, exist_ok=True)

    def _path(self, fn):
        return os.path.join(self.lib_dir, fn + '.npy')

    def cache(self, fn, obj):
        os.makedirs(os.path.dirname(self._path(fn)), exist_ok=True)
        np.save(self._path(fn), np.asarray(obj))
        if self.verbose:
            print('cached ' + self._path(fn))

    def load(self, fn):
        return np.load(self._path(fn))

    def is_cached(self, fn):
        return os.path.exists(self._path(fn))


class cacher_pk:
    """Pickle-backed cacher for arbitrary python objects (tuples of arrays, dicts, stats
    instances; reference: plancklens/helpers/cachers.py cacher_pk)."""

    def __init__(self, lib_dir, verbose=False):
        self.lib_dir = lib_dir
        self.verbose = verbose
        os.makedirs(lib_dir, exist_ok=True)

    def _path(self, fn):
        return os.path.join(self.lib_dir, fn + '.pk')

    def cache(self, fn, obj):
        import pickle
        os.makedirs(os.path.dirname(self._path(fn)), exist_ok=True)
        with open(self._path(fn), 'wb') as f:
            pickle.dump(obj, f)
        if self.verbose:
            print('cached ' + self._path(fn))

    def load(self, fn):
        import pickle
        with open(self._path(fn), 'rb') as f:
            return pickle.load(f)

    def is_cached(self, fn):
        return os.path.exists(self._path(fn))
