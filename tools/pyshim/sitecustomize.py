"""Worker-side protobuf shim for transformWithStateInPandas.

Auto-imported by the ``site`` module in every Python process whose
PYTHONPATH includes this directory — including Spark's daemonized Python
workers. This image has no pip-installed protobuf, but the cloud-sdk on
disk bundles a pure-python protobuf 6.32 runtime whose strict version
gate rejects pyspark's 6.33-generated StateMessage_pb2 by one minor
version; cross-version guarantees make a one-minor skew safe for the
wire format pyspark uses, so the gate is relaxed here.

Driver-side counterpart: hadoop_spark_pspd_spark/streaming/_protobuf_compat.py
(which also prepends this directory to PYTHONPATH before the JVM starts so
workers inherit it).
"""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(_GAE):
        sys.path.append(_GAE)
try:
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:  # pragma: no cover - no protobuf found at all
    pass
