"""Global numerical constants.

TPU-native counterpart of the reference's ``torchnmf/constants.py:3``:
``eps`` is the float32 machine epsilon used as the universal guard against
division by zero and ``log(0)`` throughout the library.  All solvers in this
package run in float32 (the TPU VPU/MXU native accumulate type), so the same
constant applies.
"""

import numpy as np

eps: float = float(np.finfo(np.float32).eps)

__all__ = ["eps"]
