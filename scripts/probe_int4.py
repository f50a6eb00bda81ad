#!/usr/bin/env python
"""Re-probe int4 (S4) lowering through the axon TPU PJRT plugin.

Watch item (CLAUDE.md / VERDICT r3 #8): an int4 bit-matrix matmul would
halve the packed scan's HBM traffic (ops/hamming_scan.py scores int8 bit
matrices on the MXU today).  Round-3 probe failed with a "Recursively
calling jit" trace error inside the plugin.  This script re-tests, prints
one JSON line per probe, and exits cleanly (never killed — device grant).

Usage: python scripts/probe_int4.py          # on the session device
"""

import json
import sys
import traceback


def probe(name, fn):
    try:
        out = fn()
        print(json.dumps({"probe": name, "ok": True, "result": out}),
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report, don't crash
        tb = traceback.format_exc(limit=2).strip().splitlines()[-1]
        print(json.dumps({"probe": name, "ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:200]}",
                          "last_frame": tb[:200]}), flush=True)
        return False


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "backend": jax.default_backend()}), flush=True)

    def mk():
        x = jnp.asarray(np.arange(16).reshape(4, 4) % 8 - 4, jnp.int4)
        return str(x.dtype)

    def matmul():
        a = jnp.asarray(np.random.randint(-8, 8, (128, 256)), jnp.int4)
        b = jnp.asarray(np.random.randint(-8, 8, (256, 128)), jnp.int4)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        out = f(a, b)
        return {"shape": list(out.shape), "dtype": str(out.dtype),
                "checksum": int(jnp.sum(out))}

    def mixed():
        # int4 codes x int8 query bits (the scan's actual shape class)
        a = jnp.asarray(np.random.randint(0, 2, (64, 3072)), jnp.int4)
        b = jnp.asarray(np.random.randint(0, 2, (3072, 512)), jnp.int4)
        f = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        return {"checksum": int(jnp.sum(f(a, b)))}

    ok = probe("int4_array_create", mk)
    if ok:
        probe("int4_matmul_128x256x128", matmul)
        probe("int4_bitmatmul_scan_shape", mixed)
    sys.exit(0)


if __name__ == "__main__":
    main()
