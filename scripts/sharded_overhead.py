"""Same-chip sharded-vs-vmap overhead (VERDICT r2 item 5).

On one real chip, a 1-device mesh sharded step pays the shard_map plumbing,
the all-gather + offset scan (degenerate on 1 device), the device-side
used-prefix compaction sort, and the checksum partials — everything the
multi-chip path adds on top of the plain vmapped batch encoder.  This
measures that overhead honestly (fetch-barrier timing) so the sharded
pipeline's projected per-chip throughput can be stated as
vmap_throughput / (1 + overhead).

Env: STAGE_BATCH (16), STAGE_EMIT (65536), STAGE_ITERS (16).
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.parallel.mesh import make_mesh  # noqa: E402
from deflate_rs_tpu.parallel.sharded import make_sharded_encoder  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402


def main():
    B = int(os.environ.get("STAGE_BATCH", "16"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    IT = int(os.environ.get("STAGE_ITERS", "16"))
    n_dev = len(jax.devices())
    opts = CompressionOptions.default()
    bufs, hist, ns, lasts = build_inputs(B, E)
    print(f"platform={jax.devices()[0].platform} devices={n_dev} B={B} E={E}")

    x0 = jax.device_put(np.ones((8,), np.int32))
    floor = sync_time(lambda v: v + 1, x0, iters=IT)
    print(f"floor(triv)          : {floor*1e3/B:8.4f} ms/chunk")

    # Plain vmapped batch encoder, checksums OFF (the corpus engine's config).
    vm = jax.vmap(functools.partial(
        ce.encode_chunk, emit_size=E, options=opts, with_checksums=False))
    t_vm = sync_time(vm, bufs, hist, ns, lasts, iters=IT)
    print(f"vmap (no checksums)  : {t_vm*1e3/B:8.4f} ms/chunk")

    # vmap + device checksums (what the sharded step's encode includes).
    vmc = jax.vmap(functools.partial(
        ce.encode_chunk, emit_size=E, options=opts, with_checksums=True))
    t_vmc = sync_time(vmc, bufs, hist, ns, lasts, iters=IT)
    print(f"vmap (+checksums)    : {t_vmc*1e3/B:8.4f} ms/chunk")

    # Full sharded step on an n_dev-mesh (1 on a single chip: degenerate
    # collectives, real compaction + plumbing).
    mesh = make_mesh(min(n_dev, B))
    step = make_sharded_encoder(mesh, opts, E)
    t_sh = sync_time(lambda *a: step(*a), bufs, hist, ns, lasts, iters=IT)
    print(f"sharded step (mesh={min(n_dev, B)}): {t_sh*1e3/B:8.4f} ms/chunk")

    ov = (t_sh - t_vm) / max(t_vm - floor, 1e-9)
    print(f"sharded-vs-vmap overhead: {(t_sh - t_vm)*1e3/B:.4f} ms/chunk "
          f"({100*ov:.1f}% of floor-corrected vmap time; includes device "
          f"checksums + compaction + collectives)")


if __name__ == "__main__":
    main()
