"""COUNTLESS 2× label-map downsampling (W. Silversmith's algorithm; the
reference vendors it at evaluation/masks/countless/ and uses
`zero_corrected_countless` for segmentation maps, mask.py:226).

2×2 majority without counting: a pixel that matches any other in the block
wins, else D. Zero-corrected variant offsets labels by +1 so label 0 is
handled correctly. Pure numpy (host-side, used during mask synthesis).
"""
import numpy as np


def _upgrade_type(data):
    dt = data.dtype
    if dt == np.uint8:
        return data.astype(np.uint16), True
    if dt == np.uint16:
        return data.astype(np.uint32), True
    if dt == np.uint32:
        return data.astype(np.uint64), True
    return data, False


def zero_corrected_countless(data: np.ndarray) -> np.ndarray:
    """Downsample a 2-D label array by 2 on each side. Even dims required."""
    assert data.ndim == 2 and data.shape[0] % 2 == 0 and data.shape[1] % 2 == 0, data.shape
    data, upgraded = _upgrade_type(data)
    data = data + 1  # make 0 participate in the matching logic

    a = data[0::2, 0::2]
    b = data[0::2, 1::2]
    c = data[1::2, 0::2]
    d = data[1::2, 1::2]

    ab = a * (a == b)
    ac = a * (a == c)
    bc = b * (b == c)
    winner = ab | ac | bc
    result = winner + (winner == 0) * d - 1

    if upgraded:
        return result.astype(_DOWNGRADE[result.dtype])
    return result


_DOWNGRADE = {np.dtype(np.uint16): np.uint8,
              np.dtype(np.uint32): np.uint16,
              np.dtype(np.uint64): np.uint32}


def countless(data: np.ndarray) -> np.ndarray:
    """Raw COUNTLESS (incorrect when 0 labels are present — kept for parity
    with the vendored module's API)."""
    assert data.ndim == 2 and data.shape[0] % 2 == 0 and data.shape[1] % 2 == 0
    data, upgraded = _upgrade_type(data)
    data = data + 1
    a = data[0::2, 0::2]
    b = data[0::2, 1::2]
    c = data[1::2, 0::2]
    d = data[1::2, 1::2]
    ab_ac = a * ((a == b) | (a == c))
    ab_ac |= b * (b == c)
    result = ab_ac + (ab_ac == 0) * d - 1
    if upgraded:
        return result.astype(_DOWNGRADE[result.dtype])
    return result
