"""Opt-in activation of the vendored protobuf runtime (vendor/).

Spark 4's ``transformWithStateInPandas`` speaks a protobuf protocol
(pyspark/sql/streaming/proto/StateMessage_pb2) between the Python
worker and the JVM state server, so ``google.protobuf`` must be
importable in BOTH the driver and the spawned Python workers. This
container has no protobuf distribution and installs are unavailable;
``vendor/protobuf_runtime`` carries the pure-Python runtime (see its
README for provenance and the one version-gate patch).

``ensure_protobuf()`` is a no-op wherever a real protobuf exists —
the vendored tree is touched only as a fallback. Call it BEFORE the
SparkSession's JVM starts so the PYTHONPATH export reaches worker
processes (they inherit the JVM's environment)."""

from __future__ import annotations

import os
import sys

_VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "vendor",
    "protobuf_runtime",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, preferring any real install.

    Returns True if protobuf is importable afterwards. Extends
    ``PYTHONPATH`` (for Python workers spawned by the JVM) and
    ``sys.path`` (for the driver) only when the import fails natively.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(_VENDOR):
        return False
    if _VENDOR not in sys.path:
        sys.path.append(_VENDOR)
    existing = os.environ.get("PYTHONPATH", "")
    if _VENDOR not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{existing}{os.pathsep}{_VENDOR}" if existing else _VENDOR
        )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
