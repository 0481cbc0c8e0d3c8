#!/usr/bin/env python
"""Batch evaluator: run scripts/metric.py on every `val/` directory found
under a results root (reference run/eval.py)."""

import argparse
import os
import subprocess
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result-dir", type=str, required=True)
    args = parser.parse_args()
    metric = os.path.join(os.path.dirname(__file__), "..", "scripts", "metric.py")
    for root, dirs, _files in os.walk(args.result_dir):
        if os.path.basename(root) == "val" and os.path.isdir(os.path.join(root, "render")):
            subprocess.run([sys.executable, metric, "--input_path", root], check=False)


if __name__ == "__main__":
    main()
