"""ZIP discovery & staging (reference S1-S4).

Spark cannot split ZIP archives across executors, so — exactly like the
reference's driver-side zipfile/unzip/7z chain
(02_ingest_istdaten.py:113-179) — archive handling stays on the driver:
members are extracted to a staging directory of plain CSV files, which
executors then read splittably in parallel.

At 100 TB the same design holds: staging is an embarrassingly parallel
pre-step (one task per archive, e.g. a distributed cp/unzip job or
`binaryFiles`+flatMap for many small archives); the analytic engine
only ever sees splittable files. We keep the reference's fallback chain
(zipfile → unzip → 7z) because Swiss open-data ZIPs use Deflate64,
which Python's zipfile cannot decode (02:128-147).
"""

from __future__ import annotations

import re
import subprocess
import zipfile
from pathlib import Path

ISTDATEN_MEMBER_RE = re.compile(r"istdaten", re.IGNORECASE)
DATE_IN_NAME_RE = re.compile(r"(\d{4})[-_](\d{2})[-_](\d{2})")


def expand_globs(patterns: list[str]) -> list[Path]:
    """Union + sort + dedupe of several glob patterns (ref 02:84-98)."""
    out: set[Path] = set()
    for pat in patterns:
        p = Path(pat)
        root = Path(p.anchor or ".")
        out.update(root.glob(str(p.relative_to(p.anchor))) if p.anchor
                   else Path(".").glob(pat))
    return sorted(out)


def zip_list_members(zip_path: Path, pattern: re.Pattern = ISTDATEN_MEMBER_RE,
                     suffix: str = ".csv") -> list[str]:
    """List matching members; zipfile → `unzip -Z1` → `7z l` fallbacks
    (ref 02:113-149)."""
    try:
        with zipfile.ZipFile(zip_path) as zf:
            names = zf.namelist()
    except Exception:
        names = _list_via_unzip(zip_path) or _list_via_7z(zip_path)
    return sorted(
        n for n in names
        if n.lower().endswith(suffix) and pattern.search(Path(n).name)
    )


def _list_via_unzip(zip_path: Path) -> list[str]:
    try:
        res = subprocess.run(["unzip", "-Z1", str(zip_path)],
                             capture_output=True, text=True, check=True)
        return res.stdout.splitlines()
    except Exception:
        return []


def _list_via_7z(zip_path: Path) -> list[str]:
    try:
        res = subprocess.run(["7z", "l", "-ba", "-slt", str(zip_path)],
                             capture_output=True, text=True, check=True)
        return [line.split("=", 1)[1].strip()
                for line in res.stdout.splitlines()
                if line.startswith("Path =")]
    except Exception:
        return []


def zip_read_member_bytes(zip_path: Path, member: str) -> bytes:
    """One member's bytes; zipfile → `unzip -p` → `7z x -so`
    (ref 02:151-179)."""
    try:
        with zipfile.ZipFile(zip_path) as zf:
            with zf.open(member) as fh:
                return fh.read()
    except Exception:
        pass
    for cmd in (["unzip", "-p", str(zip_path), member],
                ["7z", "x", "-so", str(zip_path), member]):
        try:
            res = subprocess.run(cmd, capture_output=True, check=True)
            if res.stdout:
                return res.stdout
        except Exception:
            continue
    raise OSError(f"cannot read {member} from {zip_path}")


def stage_zip_members(
    zip_path: Path,
    staging_dir: Path,
    pattern: re.Pattern = ISTDATEN_MEMBER_RE,
    normalize_encoding: bool = True,
) -> list[Path]:
    """Extract matching members to ``staging_dir`` as UTF-8 CSVs.

    Encoding is normalized here (utf-8-sig → latin-1 retry, ref
    02:189-194) so executors never deal with per-file charsets — at
    scale this is the one row-at-a-time pass, done once at the edge.
    """
    staging_dir.mkdir(parents=True, exist_ok=True)
    out: list[Path] = []
    for member in zip_list_members(zip_path, pattern):
        raw = zip_read_member_bytes(zip_path, member)
        dest = staging_dir / f"{zip_path.stem}__{Path(member).name}"
        if normalize_encoding:
            try:
                text = raw.decode("utf-8-sig")
            except UnicodeDecodeError:
                text = raw.decode("latin-1")
            dest.write_text(text, encoding="utf-8")
        else:
            dest.write_bytes(raw)
        out.append(dest)
    return out


def month_from_filename(name: str) -> str | None:
    """'YYYY-MM' from a YYYY[-_]MM[-_]DD filename (ref 02:101-108)."""
    m = DATE_IN_NAME_RE.search(name)
    return f"{m.group(1)}-{m.group(2)}" if m else None


def read_csv_from_zip_member(zip_path: Path, member: str,
                             staging_dir: Path) -> Path:
    """Stage a single named member (GTFS S1 path) and return its path."""
    raw = zip_read_member_bytes(zip_path, member)
    staging_dir.mkdir(parents=True, exist_ok=True)
    dest = staging_dir / f"{zip_path.stem}__{Path(member).name}"
    dest.write_bytes(raw)
    return dest
