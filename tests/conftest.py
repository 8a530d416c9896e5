"""Test config: force an 8-device CPU mesh so multi-device (DP) paths are
exercised without TPU hardware (SURVEY.md §4 implication 3).

Note: this environment's sitecustomize programmatically sets
jax_platforms="axon,cpu" (TPU tunnel), overriding JAX_PLATFORMS env vars —
so we must override via jax.config, and XLA_FLAGS before the first backend
initialization.
"""

import os
import re

# The suite hard-asserts 8-device mesh shapes, so an inherited
# xla_force_host_platform_device_count with any other value must be
# REPLACED, not respected (else dozens of tests fail with baffling
# mesh-shape errors).
flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()

import types

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


def make_args(**overrides):
    """A minimal args namespace with reference defaults."""
    base = dict(
        seed=42, n_devices=0, profile=False, check_numerics=False,
        model="cnn", examples=4, epochs="1", batch_size=8, epoch_size=-1,
        dir=None, max_to_keep=0, test_epochs=[], summary_freq=0,
        dtype="float32", precision="default", optimizer="rmsprop", lr=1e-3,
        loss="l1",
        momentum=0.01, decay=0.9, centered=False, beta1=0.9, beta2=0.999,
        dataset="synthetic", shuffle=True, buffer_size=10000, cache_dir=None,
        raw_dataset_dir="/tmp", dataset_dir="datasets", n_threads=1,
        latent_size=16, n_disc_train=2, vae_parity_loss=False,
        synthetic_count=64, synthetic_shape=[32, 32, 3],
        synthetic_eval_count=0, synthetic_u8=False,
        device_data_cache=True, device_cache_mb=1024,
    )
    base.update(overrides)
    return types.SimpleNamespace(**base)


@pytest.fixture
def args():
    return make_args()


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
