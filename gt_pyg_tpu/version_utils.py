"""PEP 440 version discovery from git / package metadata.

Behavioral model: reference ``gt_pyg/_version_utils.py:10-62`` — a
``git describe --tags`` string like ``v1.6.0-3-gabc1234`` is normalized to
``1.6.0.post3+gabc1234``; prerelease suffixes like ``-rc1`` become ``rc1``.
"""

import re
import subprocess
from pathlib import Path

_FALLBACK = "0+unknown"


def _normalize_prerelease(version: str) -> str:
    """Normalize ``1.2.0-rc1`` style suffixes to PEP 440 (``1.2.0rc1``)."""
    return re.sub(r"-(a|b|rc|alpha|beta)\.?(\d+)", r"\1\2", version)


def _version_from_git() -> str | None:
    try:
        repo_root = Path(__file__).resolve().parent.parent
        out = subprocess.run(
            ["git", "describe", "--tags", "--always", "--dirty"],
            cwd=repo_root,
            capture_output=True,
            text=True,
            timeout=5,
        )
        if out.returncode != 0:
            return None
        desc = out.stdout.strip()
        if not desc:
            return None
        desc = desc.lstrip("v")
        desc = _normalize_prerelease(desc)
        # "1.6.0-3-gabc1234[-dirty]" -> "1.6.0.post3+gabc1234[.dirty]"
        m = re.match(r"^(?P<tag>[0-9][^-]*)-(?P<n>\d+)-g(?P<sha>[0-9a-f]+)(?P<dirty>-dirty)?$", desc)
        if m:
            local = m.group("sha") + (".dirty" if m.group("dirty") else "")
            return f"{m.group('tag')}.post{m.group('n')}+g{local}"
        # bare sha (no tags in repo) — check before bare-tag, since a hex
        # sha can start with a digit
        if re.match(r"^[0-9a-f]{7,}(-dirty)?$", desc):
            return "0+g" + desc.replace("-dirty", ".dirty")
        # bare tag
        if re.match(r"^[0-9]", desc):
            return desc.replace("-dirty", "+dirty")
        return None
    except Exception:
        return None


def _version_from_metadata() -> str | None:
    try:
        from importlib.metadata import version

        return version("gt_pyg_tpu")
    except Exception:
        return None


def get_version() -> str:
    return _version_from_git() or _version_from_metadata() or _FALLBACK
