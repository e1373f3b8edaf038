"""Host-fingerprinted persistent-compile-cache directories.

XLA:CPU persistent-cache entries contain AOT machine code for the host
that compiled them. This repo's `.jax_cache` is shared across machines
(the grading driver's dryrun subprocess and this host's test suite both
write to it), and deserializing a foreign host's CPU executable SIGILLs
— the round-3 full-suite run died twice at ~89% inside
`jax/_src/compilation_cache.get_executable_and_time`, and the driver's
own MULTICHIP_r02 log warned "machine type ... doesn't match ... could
lead to SIGILL".

Fix: CPU-platform runs cache under `.jax_cache/cpu-<fingerprint>/`
where the fingerprint hashes the host CPU identity (model name + ISA
feature flags), so no process ever deserializes another machine's CPU
code. TPU-platform runs keep the shared root (TPU executables are
device programs, not host machine code).
"""

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    ident = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    ident.append(line.strip())
                    if len(ident) >= 3:
                        break
    except OSError:
        ident.append(platform.processor())
    return hashlib.sha1("|".join(ident).encode()).hexdigest()[:10]


def cpu_cache_dir(root: str) -> str:
    """Per-host subdirectory of `root` for CPU-platform compile caching."""
    path = os.path.join(root, f"cpu-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    return path
