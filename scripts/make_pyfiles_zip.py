#!/usr/bin/env python
"""Build the --py-files zip for spark-submit: python scripts/make_pyfiles_zip.py OUT.zip"""
import os
import sys
import zipfile

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/text2mc_dataprocessor_spark.zip"
pkg = os.path.join(repo, "text2mc_dataprocessor_spark")
with zipfile.ZipFile(out, "w") as z:
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, repo))
print(out)
