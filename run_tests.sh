#!/bin/bash
# Test runner (reference equivalent: run_tests.sh -> python -m unittest).
# Runs on CPU with a virtual 8-device mesh (tests/conftest.py).
#
# Tiers:
#   ./run_tests.sh            fast tier (default; pyproject deselects -m slow)
#   ./run_tests.sh --slow     multi-minute tier only (train-quality gate,
#                             subprocess jax.distributed test)
#   ./run_tests.sh --all      everything
set -e
case "${1:-}" in
  --slow) shift; exec python -m pytest tests/ -x -q -m slow "$@" ;;
  --all)  shift; exec python -m pytest tests/ -x -q -m "slow or not slow" "$@" ;;
  *)      exec python -m pytest tests/ -x -q "$@" ;;
esac
