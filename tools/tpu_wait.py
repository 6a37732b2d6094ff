"""Wait for the axon TPU backend to come back up.

Probes in a fresh subprocess every ~4 min (a hung init can only be
abandoned by process exit — the probe self-exits via os._exit, never
SIGTERM'd mid-call, per the axon discipline). Exits 0 the moment a tiny
jit runs, so a background runner gets notified on recovery.
"""
import subprocess
import sys
import time

PROBE = r"""
import json, os, threading
def bail():
    print("down", flush=True); os._exit(3)
t = threading.Timer(90.0, bail); t.daemon = True; t.start()
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
assert float(x) > 0
t.cancel()
print("up", flush=True)
"""

deadline = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else None
while True:
    r = subprocess.run([sys.executable, "-c", PROBE],
                       capture_output=True, text=True)
    stamp = time.strftime("%H:%M:%S")
    if "up" in r.stdout:
        print(f"{stamp} TPU UP", flush=True)
        sys.exit(0)
    print(f"{stamp} down", flush=True)
    if deadline and time.time() > deadline:
        print("gave up", flush=True)
        sys.exit(1)
    time.sleep(240)
