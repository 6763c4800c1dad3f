"""Probe whether the axon TPU relay is reachable.

The relay (127.0.0.1:8083 stateless init, :8082 session) dies from time
to time; jax.devices() then hangs for minutes.  This probe checks the
TCP port first (instant) and only then does a tiny fenced device op.

Exit 0 = TPU usable, 1 = relay port closed, 2 = port open but device op
failed/hung (caller should treat as down).
"""

import socket
import sys


def port_open(host: str = "127.0.0.1", port: int = 8083, timeout: float = 2.0) -> bool:
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def main() -> int:
    if not port_open():
        print("relay port 8083: CLOSED")
        return 1
    print("relay port 8083: open; trying a fenced device op...")
    try:
        import numpy as np
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        x = jnp.arange(8, dtype=jnp.uint32)
        y = np.asarray(x + 1)
        assert int(y[0]) == 1
        print(f"TPU ALIVE: {devs}")
        return 0
    except Exception as e:  # noqa: BLE001 - report anything as down
        print(f"device op failed: {e!r}")
        return 2


if __name__ == "__main__":
    sys.exit(main())
