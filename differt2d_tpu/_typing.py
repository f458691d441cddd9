"""Type aliases (parity with reference ``differt2d/_typing.py:7-9``)."""

from typing import Union

import jax
import numpy as np

Array = jax.Array
ArrayLikeFloat = Union[float, int, np.ndarray, jax.Array]
ScalarFloat = Union[float, int, np.ndarray, jax.Array]
ScalarInt = Union[int, np.ndarray, jax.Array]
