"""Regenerate the frozen adpfix fixture (cartnet_tpu/data/fixtures/adpfix.npz).

The committed npz is the source of truth; rerun this only to intentionally
re-freeze (doing so invalidates the pinned end-to-end MAE in
tests/test_adpfix.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from cartnet_tpu.data.adpfix import FIXTURE_PATH, save_fixture

if __name__ == "__main__":
    save_fixture()
    print(f"wrote {FIXTURE_PATH} ({os.path.getsize(FIXTURE_PATH)} bytes)")
