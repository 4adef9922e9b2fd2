#!/bin/sh
# Cold-viable CI tier (VERDICT r3 weak #7): runs the `quick`-marked test
# modules, which complete in ~3-4 minutes even with ZERO compile cache
# (plain-CPU runs on this host are always cold: the XLA:CPU AOT cache
# segfaults without the axon plugin — tests/conftest.py). The full suite
# (`pytest tests/ -q`) needs a warm cache or the chip plugin and is the
# nightly tier, not the per-commit gate.
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -m quick -q "$@"
