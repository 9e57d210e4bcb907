"""3-second box-phase probe: first-touch fault speed + steady-state
memory bandwidth + process-spawn cost.

Root cause of this sandbox's wall swings (see BASELINE.md "Box-state
drift"): Firecracker host phases where first-touch page faults cost up
to ~90us/page while already-faulted memory streams at full speed.
``first_touch_mbs`` is therefore the phase signal; ``memcpy_gbs``
(steady-state, pages pre-faulted) should stay ~15+ GB/s in any phase.
"""
import json
import mmap
import subprocess
import sys
import time

import numpy as np

SZ = 1 << 29  # 512 MiB
buf = mmap.mmap(-1, SZ)
mv = memoryview(buf)
t0 = time.time()
for off in range(0, SZ, 4096):
    mv[off] = 1
first_touch = SZ / (time.time() - t0) / 1e6
del mv
buf.close()

a = np.ones(128 * 1024 * 1024 // 8, dtype=np.float64)
b = np.empty_like(a)
np.copyto(b, a)  # pre-fault dst
t0 = time.time()
for _ in range(4):
    np.copyto(b, a)
bw = 2 * a.nbytes * 4 / (time.time() - t0) / 1e9

t0 = time.time()
subprocess.run([sys.executable, "-c", "pass"], check=True)
spawn = time.time() - t0

print(json.dumps({"first_touch_mbs": round(first_touch, 1),
                  "memcpy_gbs": round(bw, 2),
                  "spawn_sec": round(spawn, 3)}))
