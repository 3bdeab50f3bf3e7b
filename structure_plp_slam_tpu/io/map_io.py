"""Whole-map snapshot save/load (MessagePack).

Reference: src/PLPSLAM/io/map_database_io.cc:51-180 — a msgpack document
{cameras, keyfrms, landmarks, ...} written under paused threads; load
reconstructs the database for localization-only or continued mapping.

Here the map IS a pytree of arrays, so the snapshot is the compacted
arrays plus counters — loading restores a MapState directly. The document
keys keep the reference's top-level naming where a counterpart exists.
"""

from __future__ import annotations

from typing import Tuple

import msgpack
import numpy as np

import jax.numpy as jnp

from structure_plp_slam_tpu.data import map_state as ms

_FORMAT_VERSION = 1


def _arr(a) -> dict:
    a = np.asarray(a)
    return {"dtype": str(a.dtype), "shape": list(a.shape), "data": a.tobytes()}


def _unarr(d) -> np.ndarray:
    return np.frombuffer(d["data"], dtype=np.dtype(d["dtype"])).reshape(d["shape"])


def save_map(path: str, state: ms.MapState, *, next_kf: int, next_lm: int,
             next_line: int = 0, next_plane: int = 0,
             camera_name: str = "", camera=None):
    doc = _build_doc(state, next_kf, next_lm, camera_name, camera,
                     next_line=next_line, next_plane=next_plane)
    with open(path, "wb") as f:
        f.write(msgpack.packb(doc, use_bin_type=True))


def _build_doc(state, next_kf, next_lm, camera_name="", camera=None, *,
               next_line=0, next_plane=0):
    doc = {
        "version": _FORMAT_VERSION,
        "camera_name": camera_name,
        "keyframe_next_id": next_kf,
        "landmark_next_id": next_lm,
        # Reference saves landmarks_line alongside points
        # (map_database_io.cc:51-103); planes are ours beyond parity.
        "line_next_id": next_line,
        "plane_next_id": next_plane,
        "arrays": {name: _arr(getattr(state, name)) for name in state._fields},
    }
    if camera is not None:
        # Full camera round-trip (reference: data/camera_database — the
        # snapshot registers camera models for reload).
        import dataclasses

        doc["cameras"] = {
            camera.name: {
                k: (v.value if hasattr(v, "value") else v)
                for k, v in dataclasses.asdict(camera).items()
            }
        }
    return doc


def save_map_async(writer, state: ms.MapState, *, next_kf: int, next_lm: int,
                   next_line: int = 0, next_plane: int = 0,
                   camera_name: str = "", camera=None):
    """Serialize + hand the blob to a native AsyncSnapshotWriter
    (checkpointing without stalling the tracking loop)."""
    doc = _build_doc(state, next_kf, next_lm, camera_name, camera,
                     next_line=next_line, next_plane=next_plane)
    writer.submit(msgpack.packb(doc, use_bin_type=True))


def _read_doc(path: str) -> dict:
    with open(path, "rb") as f:
        doc = msgpack.unpackb(f.read(), raw=False)
    if doc.get("version") != _FORMAT_VERSION:
        raise ValueError(f"unsupported map snapshot version {doc.get('version')}")
    return doc


def _doc_counters(doc: dict) -> dict:
    """All id counters from a snapshot doc. Line/plane counters of
    snapshots written before they were recorded fall back to the highest
    valid slot + 1 (append-only slot discipline makes that an upper
    bound)."""

    def derived(mask_key):
        m = _unarr(doc["arrays"][mask_key])
        idx = np.where(m)[0]
        return int(idx[-1]) + 1 if len(idx) else 0

    return {
        "next_kf": int(doc["keyframe_next_id"]),
        "next_lm": int(doc["landmark_next_id"]),
        "next_line": int(doc.get("line_next_id", derived("ln_valid"))),
        "next_plane": int(doc.get("plane_next_id", derived("pl_valid"))),
    }


def load_map_with_counters(path: str) -> Tuple[ms.MapState, dict]:
    """One-parse load: (state, counters dict). Prefer this over
    load_map + load_counters, which would deserialize the (potentially
    very large) snapshot twice."""
    doc = _read_doc(path)
    arrays = {k: jnp.asarray(_unarr(v)) for k, v in doc["arrays"].items()}
    return ms.MapState(**arrays), _doc_counters(doc)


def load_map(path: str) -> Tuple[ms.MapState, int, int]:
    """Returns (state, next_kf, next_lm); see ``load_map_with_counters``
    for the full counter set in one parse."""
    state, c = load_map_with_counters(path)
    return state, c["next_kf"], c["next_lm"]


def load_counters(path: str) -> dict:
    return _doc_counters(_read_doc(path))


def load_cameras(path: str) -> dict:
    """Camera parameter dicts stored in a snapshot (may be empty)."""
    with open(path, "rb") as f:
        doc = msgpack.unpackb(f.read(), raw=False)
    return doc.get("cameras", {})
