"""Environment shim (see stellarsql_spark/streaming/runtime.py): makes
a real google.protobuf importable from the host google-cloud-sdk's
vendored copy (runtime 6.32.0) and disables the gencode-vs-runtime
version gate (pyspark 4.1.2 ships gencode 6.33.0; the 6.32/6.33 wire
format is identical).  Loaded via PYTHONPATH so pyspark's Python
workers pick it up too.

Trap this guards against: Spark worker processes carry the
spark-core JAR on sys.path, and the JAR's embedded google/protobuf/
*.proto resource directory satisfies `import google.protobuf` as an
EMPTY namespace package — so the probe must ask for a real module
(descriptor), not just the package.
"""
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if not _protobuf_usable():
    # Front of sys.path so the appengine portion beats the JAR's
    # resource-dir namespace portion; purge any cached empty-namespace
    # google modules so the re-import sees the new path.
    if _APPENGINE not in sys.path:
        sys.path.insert(0, _APPENGINE)
    for _name in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[_name]
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass
