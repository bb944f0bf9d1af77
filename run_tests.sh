#!/bin/bash
# Test runner (reference equivalent: run_tests.sh -> python -m unittest).
# Runs on CPU with a virtual 8-device mesh (tests/conftest.py).
set -e
python -m pytest tests/ -x -q "$@"
