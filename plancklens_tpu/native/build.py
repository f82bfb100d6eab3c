"""Build libplkcore.so in place: `python -m plancklens_tpu.native.build`.

Thin driver around the Makefile-equivalent g++ line so the documented build command
works without make on PATH (role of the reference's setup-time f2py compilation of
plancklens/wigners/wigners.f90 / n1/n1f.f90)."""
import os
import subprocess
import sys


def build(verbose=True):
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-fPIC', '-shared', '-std=c++17',
           os.path.join(here, 'plkcore.cc'), '-o', os.path.join(here, 'libplkcore.so')]
    if verbose:
        print(' '.join(cmd))
    subprocess.check_call(cmd)
    return os.path.join(here, 'libplkcore.so')


if __name__ == '__main__':
    so = build()
    print('built', so)
    sys.exit(0)
