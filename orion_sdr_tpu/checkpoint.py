"""Checkpoint / resume for streaming receiver state.

The reference has no persistence story — its streaming state is just the
accumulation buffers and counters inside the stream demods (SURVEY §5
"Checkpoint / resume: absent"). This module adds one, beyond parity: any
host-side streaming driver (`Psk31Stream`, `Ft8StreamDecoder`,
`OfdmFrameStreamDemod`, `DvbTFrameStreamDemod`, the `blocks.py` wrappers, …)
can be snapshotted to a single ``.npz`` file and resumed in a fresh process,
with decode output identical to an uninterrupted run.

Design: the streaming drivers keep ALL mutable state as plain host values —
numpy buffers, Python scalars, deques, small dicts, and nested stateful
helpers (``VaricodeDecoder``, ``StreamingViterbi``, ``CallsignHashTable``).
So a checkpoint is a reflective walk of ``__dict__``:

* ``np.ndarray``            → stored as an npz array entry
* scalars / str / None      → stored in a JSON meta tree
* complex                   → ``{"__complex__": [re, im]}``
* deque / list / tuple of scalars → JSON list (container kind tagged)
* dict with int/str keys    → JSON object (int keys tagged)
* frozen dataclasses (configs: ``OfdmConfig``, ``DvbTFrameParams``,
  ``OfdmPreamble``, `Mcs` tables, …) → NOT serialized; they are
  construction-time configuration, not runtime state. Their ``repr`` is
  hashed into a fingerprint checked on load, so resuming into a receiver
  built with a different configuration raises instead of silently
  misbehaving.
* other objects with ``__dict__`` → recursed as nested state

``load_state_dict`` restores in place into an object constructed with the
same configuration (mirrors the torch/flax convention).
"""

from __future__ import annotations

import dataclasses
import hashlib
import io
import json
from collections import deque
from typing import Any, Dict, Tuple

import numpy as np

_FMT_VERSION = 1

_SCALARS = (bool, int, float, str)


def _is_frozen_config(v: Any) -> bool:
    return (dataclasses.is_dataclass(v) and not isinstance(v, type)
            and v.__dataclass_params__.frozen)


def _config_repr(v: Any) -> str:
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_config_repr(x) for x in v) + "]"
    if isinstance(v, np.ndarray):
        # repr truncates large arrays — digest the raw bytes instead
        return (f"ndarray({v.dtype},{v.shape},"
                f"{hashlib.sha256(np.ascontiguousarray(v)).hexdigest()})")
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        fields = ",".join(f"{f.name}={_config_repr(getattr(v, f.name))}"
                          for f in dataclasses.fields(v))
        return f"{type(v).__name__}({fields})"
    return repr(v)


def _encode(v: Any, path: str, arrays: Dict[str, np.ndarray],
            fingerprint: "hashlib._Hash") -> Any:
    """→ JSON-able meta node; arrays collected into ``arrays`` by path."""
    if v is None or isinstance(v, _SCALARS):
        return v
    if isinstance(v, (np.bool_, np.integer)):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, (complex, np.complexfloating)):
        return {"__complex__": [float(v.real), float(v.imag)]}
    if isinstance(v, np.ndarray):
        arrays[path] = v
        return {"__array__": path}
    if isinstance(v, (list, tuple, deque)):
        if (not isinstance(v, deque) and v
                and all(_is_frozen_config(x) for x in v)):
            fingerprint.update(f"{path}={_config_repr(v)}".encode())
            return {"__config__": f"seq[{type(v[0]).__name__}]"}
        kind = ("deque" if isinstance(v, deque)
                else "tuple" if isinstance(v, tuple) else "list")
        return {"__seq__": kind,
                "items": [_encode(x, f"{path}.{i}", arrays, fingerprint)
                          for i, x in enumerate(v)]}
    if isinstance(v, dict):
        items = {}
        int_keys = all(isinstance(k, (int, np.integer)) for k in v)
        for k, x in v.items():
            items[str(k)] = _encode(x, f"{path}.{k}", arrays, fingerprint)
        return {"__dict__": items, "int_keys": bool(int_keys and v)}
    if _is_frozen_config(v):
        fingerprint.update(f"{path}={_config_repr(v)}".encode())
        return {"__config__": type(v).__name__}
    if hasattr(v, "__dict__"):
        return {"__object__": type(v).__name__,
                "state": _encode_obj(v, path, arrays, fingerprint)}
    raise TypeError(
        f"checkpoint: cannot serialize {type(v).__name__!r} at {path!r}")


def _encode_obj(obj: Any, path: str, arrays: Dict[str, np.ndarray],
                fingerprint: "hashlib._Hash") -> Dict[str, Any]:
    out = {}
    for name, v in vars(obj).items():
        node_path = f"{path}.{name}" if path else name
        out[name] = _encode(v, node_path, arrays, fingerprint)
    return out


def _decode(meta: Any, arrays: Dict[str, np.ndarray], current: Any) -> Any:
    if meta is None or isinstance(meta, _SCALARS):
        return meta
    if isinstance(meta, dict):
        if "__complex__" in meta:
            re, im = meta["__complex__"]
            return complex(re, im)
        if "__array__" in meta:
            return arrays[meta["__array__"]]
        if "__seq__" in meta:
            # carry per-item counterparts through sequences so nested
            # objects (e.g. a band receiver's per-channel streams) restore
            # into the freshly constructed target's instances
            if (isinstance(current, (list, tuple, deque))
                    and len(current) == len(meta["items"])):
                cur = list(current)
            else:
                cur = [None] * len(meta["items"])
            items = [_decode(m, arrays, c)
                     for m, c in zip(meta["items"], cur)]
            if meta["__seq__"] == "deque":
                return deque(items)
            if meta["__seq__"] == "tuple":
                return tuple(items)
            return items
        if "__dict__" in meta:
            conv = int if meta.get("int_keys") else str
            cur = current if isinstance(current, dict) else {}
            return {conv(k): _decode(m, arrays, cur.get(conv(k)))
                    for k, m in meta["__dict__"].items()}
        if "__config__" in meta:
            return current                     # configs stay as constructed
        if "__object__" in meta:
            if current is None or not hasattr(current, "__dict__"):
                raise ValueError(
                    "checkpoint: nested object "
                    f"{meta['__object__']!r} has no counterpart in the "
                    "target — construct the receiver with the same "
                    "configuration before loading")
            _restore_obj(current, meta["state"], arrays)
            return current
    raise TypeError(f"checkpoint: malformed meta node {meta!r}")


def _restore_obj(obj: Any, state: Dict[str, Any],
                 arrays: Dict[str, np.ndarray]) -> None:
    for name, meta in state.items():
        if name not in vars(obj):
            raise ValueError(
                f"checkpoint: target {type(obj).__name__} has no attribute "
                f"{name!r} — was it built with the same configuration?")
        setattr(obj, name, _decode(meta, arrays, getattr(obj, name)))


def state_dict(obj: Any) -> Dict[str, Any]:
    """Snapshot a streaming driver's mutable state.

    Returns ``{"class", "fingerprint", "meta", "arrays"}`` where ``meta``
    is a JSON-able tree and ``arrays`` maps dotted paths to numpy arrays.
    Frozen-dataclass configuration objects are fingerprinted, not stored.
    """
    fp = hashlib.sha256(type(obj).__name__.encode())
    arrays: Dict[str, np.ndarray] = {}
    meta = _encode_obj(obj, "", arrays, fp)
    return {"class": type(obj).__name__, "fingerprint": fp.hexdigest(),
            "meta": meta, "arrays": arrays}


def load_state_dict(obj: Any, state: Dict[str, Any]) -> Any:
    """Restore ``state_dict`` output into ``obj`` (in place; returns it).

    ``obj`` must be freshly constructed with the same configuration: the
    class name and the fingerprint of every frozen-dataclass config are
    checked and a mismatch raises ``ValueError``.
    """
    if state["class"] != type(obj).__name__:
        raise ValueError(
            f"checkpoint: saved state is for {state['class']!r}, "
            f"target is {type(obj).__name__!r}")
    fp = hashlib.sha256(type(obj).__name__.encode())
    scratch: Dict[str, np.ndarray] = {}
    _encode_obj(obj, "", scratch, fp)
    if fp.hexdigest() != state["fingerprint"]:
        raise ValueError(
            "checkpoint: configuration fingerprint mismatch — the target "
            f"{type(obj).__name__} was constructed with different "
            "parameters than the checkpointed receiver")
    _restore_obj(obj, state["meta"], state["arrays"])
    return obj


def save_checkpoint(path: str, obj: Any) -> None:
    """Write a streaming driver's state to one ``.npz`` file."""
    st = state_dict(obj)
    header = json.dumps({"version": _FMT_VERSION, "class": st["class"],
                         "fingerprint": st["fingerprint"],
                         "meta": st["meta"]})
    buf = io.BytesIO()
    np.savez(buf, __header__=np.frombuffer(header.encode(), np.uint8),
             **{f"a:{k}": v for k, v in st["arrays"].items()})
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_checkpoint(path: str, obj: Any) -> Any:
    """Load a ``save_checkpoint`` file into a same-config receiver."""
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        if header.get("version") != _FMT_VERSION:
            raise ValueError(
                f"checkpoint: unsupported format version "
                f"{header.get('version')!r}")
        arrays = {k[2:]: z[k] for k in z.files if k.startswith("a:")}
    return load_state_dict(obj, {"class": header["class"],
                                 "fingerprint": header["fingerprint"],
                                 "meta": header["meta"],
                                 "arrays": arrays})
