#!/usr/bin/env python
"""Batch trainer: run slam_trainer over every YAML under a directory
(reference run/train.py)."""

import argparse
import os
import subprocess
import sys


def run_config(executable, config_path):
    command = executable.split() + [config_path]
    print(f"Running: {' '.join(command)}")
    try:
        subprocess.run(command, check=True)
        print(f"Finished running {config_path}")
    except subprocess.CalledProcessError as e:
        print(f"Error running {config_path}: {e}")
    print("-" * 50)


def process_configs(executable, folder):
    for root, _dirs, files in os.walk(folder):
        for file in sorted(files):
            if file.endswith(".yaml"):
                run_config(executable, os.path.join(root, file))


def main():
    parser = argparse.ArgumentParser(description="Process YAML configurations.")
    default_exe = f"{sys.executable} {os.path.join(os.path.dirname(__file__), '..', 'slam_trainer.py')}"
    parser.add_argument("--executable", type=str, default=default_exe)
    parser.add_argument("--config-dir", type=str, required=True)
    args = parser.parse_args()
    process_configs(args.executable, args.config_dir)


if __name__ == "__main__":
    main()
