"""Make a usable protobuf runtime available for transformWithStateInPandas.

pyspark 4's TWS Python runner speaks a protobuf protocol between the JVM
and the Python worker (pyspark/sql/streaming/proto/StateMessage_pb2.py,
gencode 6.33). A pip-installed protobuf is preferred whenever importable;
only when absent does the shim fall back to the cloud-sdk's bundled
pure-python 6.32 runtime (present on this image), whose strict
gencode>=runtime version gate rejects the one-minor skew. Protobuf's
cross-version guarantees cover the plain message (de)serialization pyspark
uses, so we relax the gate rather than fork the proto. On images with
neither pip protobuf nor the cloud-sdk bundle, ensure_protobuf() returns
False and the TWS test degrades to a documented skip.

Two halves:
  * ``ensure_protobuf()`` — driver-side: put the bundled runtime on
    ``sys.path``, no-op the version gate, and extend ``PYTHONPATH`` with
    ``tools/pyshim`` (whose ``sitecustomize.py`` repeats the patch) so any
    JVM/worker launched later inherits it. Call BEFORE building the
    SparkSession that will run a TWS query.
  * ``tools/pyshim/sitecustomize.py`` — worker-side: auto-imported at
    interpreter startup in Spark's Python workers.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM = str(Path(__file__).resolve().parents[2] / "tools" / "pyshim")


def ensure_protobuf() -> bool:
    """Return True iff a working protobuf runtime is importable (after
    shimming); also propagate the shim to future worker processes.

    Portability order: a pip-installed protobuf always wins — the GAE
    bundle only enters sys.path/PYTHONPATH when ``import google.protobuf``
    fails without it. (PYTHONPATH entries precede site-packages in every
    worker's sys.path, so unconditionally exporting the GAE path would
    shadow a newer pip protobuf with the bundled 6.32 runtime on images
    that have both.)"""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    need_gae = False
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        if not os.path.isdir(_GAE):
            return False
        need_gae = True
        if _GAE not in sys.path:
            sys.path.append(_GAE)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:  # pragma: no cover
            return False
    parts = [x for x in os.environ.get("PYTHONPATH", "").split(os.pathsep) if x]
    wanted = [_SHIM, _GAE] if need_gae else [_SHIM]
    for p in wanted:
        if os.path.isdir(p) and p not in parts:
            parts.insert(0, p)
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:  # pragma: no cover - pre-runtime_version protobuf
        pass
    try:
        import google.protobuf.descriptor  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    return True
