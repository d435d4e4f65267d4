"""GDAL-runtime facade: the reference's configuration / VSI filesystem
surface (/root/reference/pyogrio/core.py:330-448, _ogr.pyx:78-136,369-374,
_vsi.pyx:195-321) mapped onto this engine's runtime.

There is no GDAL here, so each name maps to the engine-native equivalent:

* ``set_gdal_config_options`` / ``get_gdal_config_option`` — a
  session-scoped option store with the reference's exact normalization
  (bool -> 'ON'/'OFF' on set; 'ON'/'OFF' -> bool, digits -> int on get;
  ``None`` clears). The engine itself is configured through Spark confs,
  not GDAL options, so the store exists for facade parity: code ported
  from pyogrio keeps working and round-trips its values. Options whose
  meaning carries over are honored and documented per-key below.
* ``get_gdal_data_path`` — ``None`` (no GDAL data directory exists).
* ``vsi_listtree`` / ``vsi_rmtree`` / ``vsi_unlink`` — operate on the
  ``/vsimem/`` namespace (backed by a process-local temp root,
  pyogrio_spark.uri.vsimem_to_local) and on plain local paths, with the
  reference's error types and messages (_vsi.pyx:195-321).
* ``vsi_curl_clear_cache`` — clears the engine's remote/archive fetch
  cache (the extracted-zip cache in io.dispatch), the direct analogue of
  GDAL's curl cache.
* ``__gdal_version__`` family — sentinel values: ``(0, 0, 0)`` plus an
  explanatory string, so feature gates like
  ``__gdal_version__ >= (3, 6)`` take the no-GDAL branch deterministically
  instead of crashing; ``__gdal_geos_version__`` is ``None`` exactly as
  the reference reports when GEOS is absent.
"""

from __future__ import annotations

import fnmatch
import os
import shutil
from pathlib import Path

__gdal_version__ = (0, 0, 0)
__gdal_version_string__ = "0.0.0 (pyogrio_spark: no GDAL runtime)"
__gdal_geos_version__ = None  # reference semantics for "GEOS not available"

# Session-scoped store. The engine's scratch space (the /vsimem/ root +
# zip-extract cache) lives under tempfile.gettempdir(), which already
# honors TMPDIR — so GDAL's CPL_TMPDIR relocation is a pass-through of
# the platform mechanism, not a second one.
_CONFIG_OPTIONS: dict[str, str] = {}


def set_gdal_config_options(options: dict) -> None:
    """Reference core.py:330-350 / _ogr.pyx:78-103: ``True``/``False``
    normalize to ``'ON'``/``'OFF'``; ``None`` clears; everything else is
    stored as ``str(value)``. Unknown names are accepted silently, like
    GDAL."""
    for name, value in options.items():
        if value is None:
            _CONFIG_OPTIONS.pop(str(name), None)
        elif isinstance(value, bool):
            _CONFIG_OPTIONS[str(name)] = "ON" if value else "OFF"
        else:
            _CONFIG_OPTIONS[str(name)] = str(value)


def get_gdal_config_option(name: str):
    """Reference core.py:352-366 / _ogr.pyx:106-136: unset -> ``None``,
    all-digit strings -> ``int``, ``'ON'``/``'OFF'`` -> bool, else the
    stored string."""
    value = _CONFIG_OPTIONS.get(str(name))
    if not value:
        return None
    if value.isdigit():
        return int(value)
    if value == "ON":
        return True
    if value == "OFF":
        return False
    return value


def get_gdal_data_path():
    """Reference core.py:369-377: the GDAL data directory, or ``None``
    when not found — which, with no GDAL runtime, is always."""
    return None


def _to_local(path: str) -> str:
    from pyogrio_spark.uri import vsimem_to_local

    p = str(path)
    if p.startswith("/vsimem"):
        # normalize bare "/vsimem" to the namespace root
        if p in ("/vsimem", "/vsimem/"):
            from pyogrio_spark.uri import vsimem_root

            return vsimem_root()
        return vsimem_to_local(p)
    return p


def vsi_listtree(path: str | Path, pattern: str | None = None) -> list[str]:
    """Recursive VSI directory listing with optional fnmatch filter
    (reference core.py:380-398, _vsi.pyx:195-240). Entries are relative
    to ``path`` before filtering — matching GDAL's VSIReadDirRecursive —
    then re-prefixed with ``path``; directories end with ``/``."""
    if isinstance(path, Path):
        path = path.as_posix()
    local = _to_local(path)
    if not os.path.exists(local):
        raise FileNotFoundError(f"Path does not exist: '{path}'")
    if not os.path.isdir(local):
        raise NotADirectoryError(f"Path is not a directory: '{path}'")
    rels: list[str] = []
    for root, dirs, files in os.walk(local):
        rel_root = os.path.relpath(root, local)
        prefix = "" if rel_root == "." else rel_root.replace(os.sep, "/") + "/"
        for d in sorted(dirs):
            rels.append(f"{prefix}{d}/")
        for f in sorted(files):
            rels.append(f"{prefix}{f}")
    if pattern is not None:
        rels = fnmatch.filter(rels, pattern)
    base = path if path.endswith("/") else f"{path}/"
    return [f"{base}{r}" for r in rels]


def vsi_rmtree(path: str | Path) -> None:
    """Reference core.py:400-412, _vsi.pyx:243-269: recursive removal;
    refuses the ``/vsimem`` root itself."""
    if isinstance(path, Path):
        path = path.as_posix()
    p = str(path)
    if p.rstrip("/").endswith("/vsimem") or p in ("/vsimem", "/vsimem/"):
        raise OSError("path to in-memory file or directory is required")
    local = _to_local(p)
    if not os.path.exists(local):
        raise FileNotFoundError(f"Path does not exist: '{path}'")
    if not os.path.isdir(local):
        raise NotADirectoryError(f"Path is not a directory: '{path}'")
    shutil.rmtree(local)


def vsi_unlink(path: str | Path) -> None:
    """Reference core.py:414-426, _vsi.pyx:272-300: remove one VSI file."""
    if isinstance(path, Path):
        path = path.as_posix()
    local = _to_local(str(path))
    if not os.path.exists(local):
        raise FileNotFoundError(f"Path does not exist: '{path}'")
    if os.path.isdir(local):
        raise IsADirectoryError(f"Path is a directory: '{path}'")
    os.unlink(local)


def vsi_curl_clear_cache(prefix: str = "") -> None:
    """Reference core.py:428-448: clear the remote-fetch cache. The
    engine's equivalent of GDAL's curl cache is the extracted-archive
    cache in io.dispatch (remote/zip datasets staged once per mtime);
    a ``prefix`` limits clearing to archives under that path prefix."""
    from pyogrio_spark.io import dispatch

    doomed = [
        k for k in list(dispatch._ZIP_CACHE)
        if not prefix or k[0].startswith(os.path.abspath(prefix))
    ]
    for k in doomed:
        root = dispatch._ZIP_CACHE.pop(k, None)
        if root and os.path.isdir(root):
            shutil.rmtree(root, ignore_errors=True)
