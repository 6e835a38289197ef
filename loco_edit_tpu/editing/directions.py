"""Direction (vT) persistence: save / load / transfer / compose.

The reference's user-visible workflow memoizes computed bases as .pt files
and reuses them across runs and across samples ("direction transfer" via
--vT_path, composition via --vT1_path; src/modules/edit.py:2283-2336,
2188-2195). Here directions are .npz with metadata, one file per principal
component or a stacked basis.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def mask_cache_tag(mask) -> str:
    """Cache-key fragment identifying the edit mask.

    The reference keys its basis cache directory by the selected mask
    (``...-select-mask{mask_index}``, edit.py:966/:1790) so that re-running
    with a different --mask_index recomputes rather than reloading the
    previous mask's bases. Pipelines here receive the mask *array*, so the
    tag hashes the content — stricter than an index (two runs whose
    sampling produced different masks under the same index also miss).
    """
    if mask is None:
        return "nomask"
    m = np.ascontiguousarray(np.asarray(mask, dtype=bool))
    import zlib
    return f"mask{zlib.crc32(m.tobytes()) & 0xFFFFFFFF:08x}"


def save_directions(path: str, vT: np.ndarray, **metadata: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, vT=np.asarray(vT), **{k: np.asarray(v) for k, v in metadata.items()})


def load_directions(path: str) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    with np.load(path, allow_pickle=False) as z:
        vT = z["vT"]
        meta = {k: z[k] for k in z.files if k != "vT"}
    return vT, meta
