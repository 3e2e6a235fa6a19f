"""Stub numba for running the reference implementation in-sandbox.

jit/njit become identity decorators: the decorated kernels run as plain
numpy/Python, which follows the SAME IEEE semantics and numpy promotion
rules numba compiles to (verified for the three kernels in distance.py:
float32 arithmetic in is_point_far_enough, int32*float32 -> float64 in
xyz_to_key). Used only by scripts/gen_ref_golden.py to produce checked-in
golden assignments from the reference's own Node/Grid code.
"""


def jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn
    return deco


njit = jit
