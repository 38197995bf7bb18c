"""Device sanity probe (the reference's pytorchtest.py:1-13 analog).

Prints the JAX backend, device inventory, and a one-op smoke result so a
user can confirm the TPU (or CPU fallback) is reachable before launching
training.

Usage: python -m sgc_tpu.cli.devices
"""

from __future__ import annotations


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"jax {jax.__version__}, backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device {d.id}: {d.device_kind} ({d.platform})")
    x = jnp.ones((128, 128))
    y = (x @ x).block_until_ready()
    print(f"matmul smoke test: OK (sum={float(y.sum()):.0f})")


if __name__ == "__main__":
    main()
