"""Build dist/hydra_spark.zip for `spark-submit --py-files`.

Deterministic: fixed timestamps + sorted entries, so rebuilding an
unchanged tree yields a byte-identical archive (cluster caches and
checksum-based deploys stay warm).
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXED_DATE = (1980, 1, 1, 0, 0, 0)  # zip epoch


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or ROOT / "dist" / "hydra_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(
        p for p in (ROOT / "hydra_spark").rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(ROOT)), date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    path = build(pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(path)
