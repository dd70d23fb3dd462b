#!/bin/bash
# headline TPU benchmark (one JSON line on stdout)
set -e
cd "$(dirname "$0")/.."
python bench.py
