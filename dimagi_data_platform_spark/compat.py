"""Optional-dependency shims.

``ensure_protobuf()`` makes ``google.protobuf`` importable when the
container has no protobuf install, by falling back to the vendored
pure-Python runtime in ``vendor/`` (see vendor/README.md for
provenance and the two marked patches). PySpark 4 needs protobuf only
for the ``transformWithStateInPandas`` worker protocol
(pyspark/sql/streaming/proto/StateMessage_pb2.py) — everything else in
this engine runs without it.

Must be called BEFORE the SparkSession (JVM) starts: the Python
workers that execute transformWithState are launched by the JVM with
the PYTHONPATH captured at JVM start, so the vendor path has to be in
``os.environ['PYTHONPATH']`` by then for workers to inherit it.
:func:`dimagi_data_platform_spark.session.get_spark` calls this.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor"
)


def _find_pb() -> bool:
    try:
        # raises ModuleNotFoundError when the google namespace itself
        # is absent (the exact case the vendor fallback exists for)
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def ensure_protobuf() -> bool:
    """Return True if ``google.protobuf`` is importable, activating the
    vendored runtime iff needed. Idempotent; no-op on normal installs."""
    if _find_pb():
        return True
    if not os.path.isdir(os.path.join(_VENDOR, "google", "protobuf")):
        return False
    if _VENDOR not in sys.path:
        sys.path.insert(0, _VENDOR)
    # Workers inherit PYTHONPATH through the JVM; prepend, don't clobber.
    pp = os.environ.get("PYTHONPATH", "")
    parts = pp.split(os.pathsep) if pp else []
    if _VENDOR not in parts:
        os.environ["PYTHONPATH"] = (
            _VENDOR + (os.pathsep + pp if pp else "")
        )
    # A half-imported namespace stub from an earlier failed probe would
    # mask the vendor path; drop it so the next import re-resolves.
    mod = sys.modules.get("google")
    if mod is not None and not hasattr(mod, "protobuf"):
        del sys.modules["google"]
    return _find_pb()
