"""Build biocypher_spark.zip for spark-submit --py-files."""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(ROOT, "biocypher_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, "biocypher_spark")):
            if "__pycache__" in dirpath:
                continue
            for name in filenames:
                if name.endswith((".py", ".yaml", ".ttl")):
                    full = os.path.join(dirpath, name)
                    zf.write(full, os.path.relpath(full, ROOT))
        # ship the default schema config alongside
        cfg = os.path.join(ROOT, "config", "transcripts_schema.yaml")
        if os.path.exists(cfg):
            zf.write(cfg, "config/transcripts_schema.yaml")
    print(out)


if __name__ == "__main__":
    main()
