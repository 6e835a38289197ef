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

    The hash covers the mask's RAW bytes in its given dtype plus its shape
    and dtype (subspace_iteration accepts SOFT float mask weights —
    pullback.py — so two soft masks with the same support must NOT collide;
    a bool mask and its float cast hash differently by design, matching the
    distinct programs they run), digested with sha1 (this keys correctness —
    a collision silently reloads the wrong basis — so a 32-bit crc is too
    weak).
    """
    if mask is None:
        return "nomask"
    import hashlib
    m = np.ascontiguousarray(np.asarray(mask))
    h = hashlib.sha1()
    h.update(str(m.dtype).encode())
    h.update(np.asarray(m.shape, np.int64).tobytes())
    h.update(m.tobytes())
    return f"mask{h.hexdigest()[:12]}"


def save_directions(path: str, vT: np.ndarray, **metadata: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, vT=np.asarray(vT), **{k: np.asarray(v) for k, v in metadata.items()})


def load_directions(path: str) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    with np.load(path, allow_pickle=False) as z:
        vT = z["vT"]
        meta = {k: z[k] for k in z.files if k != "vT"}
    return vT, meta
