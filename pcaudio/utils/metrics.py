"""Structured metrics: JSONL stream + reference-schema result files.

Upgrades the reference's observability story — ``print()`` lines
(``Code/settransformer.py:115,131``), ad-hoc dict→JSON dumps
(``Code/pceval.py:103-105``), TensorBoard only in the vendored demo
(``main_pointcloud.py:52``) — to one structured writer: every record is a
JSON line with a wall-clock timestamp and monotonically increasing index;
experiment dicts are written with their exact reference schema via
:func:`dump_reference_json`.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsWriter:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._idx = 0
        self._f = open(path, "a", buffering=1)

    def write(self, record: Dict[str, Any]) -> None:
        rec = {"index": self._idx, "time": time.time(), **record}
        self._f.write(json.dumps(rec) + "\n")
        self._idx += 1

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(path: str):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def dump_reference_json(result: Dict, path: str) -> None:
    """Write an experiment result dict in the reference's exact on-disk form
    (plain ``json.dump``, keys stringified exactly as the reference scripts'
    dicts do — ``Code/pceval.py:103-105,186-192``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f)


def dump_with_provenance(result: Dict, path: str, provenance: Dict) -> str:
    """Reference-schema artifact plus a ``*.provenance.json`` side-file.

    Schema-ADDITIVE: ``path`` stays byte-compatible with the reference's
    artifact (the reference has no provenance concept); the side-file
    records how the artifact was produced — eval engine (fused/XLA), the
    fused parity-gate outcome and agreement count, corpus and checkpoint
    paths, wall time.  Returns the side-file path.
    """
    dump_reference_json(result, path)
    assert path.endswith(".json")
    side = path[: -len(".json")] + ".provenance.json"
    with open(side, "w") as f:
        json.dump(provenance, f, indent=1)
        f.write("\n")
    return side
