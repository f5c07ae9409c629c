"""Shared batched, device-sharded, prefetched predict loop.

One implementation drives both the test CLI (tools/test_UniBEV.py — the
reference's multi_gpu_test analog, test_UniBEV.py:218-224) and the
training-time eval hook (runtime/eval_hook.py — the reference EvalHook runs
multi-GPU eval every epoch; VERDICT r3 #7 flagged the hook's former B=1
single-device loop as an epoch-wall-clock hazard).

Batches run at B = local_device_count over the 'data' mesh axis; a
background thread prefetches + shards the next batch while the device works.
Outputs are replicated (all-gathered inside the jitted predict) so every
process can read its own rows at global offset process_index * B + j even
when the batch is a multi-host global array.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def max_sca_overflow(inter):
    """Max of the sown sca_topk_overflow counters in an intermediates tree.

    -1 when the counter is absent (no camera branch / no rebatch).  A value
    > 0 means the camera SCA silently dropped pillar hits beyond rebatch_k —
    a correctness hazard, not a perf detail (VERDICT r4 #5): production
    surfaces (bench.py, tools/test_UniBEV.py) must flag it.
    """
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves_with_path(inter)
    vals = [jnp.max(leaf) for path, leaf in leaves
            if any("sca_topk_overflow" in str(getattr(k, "key", k))
                   for k in path)]
    if not vals:
        return jnp.int32(-1)
    return jnp.int32(jnp.max(jnp.stack(vals)))


def make_replicated_predict(model, mesh: Mesh) -> Callable:
    """jit model.predict with replicated (all-gathered) outputs.

    The output dict carries an extra scalar 'sca_overflow' (see
    max_sca_overflow); unused sown intermediates are dead code under jit so
    the probe costs nothing.
    """
    from unibev_tpu.models.detectors.unibev import UniBEV

    def _predict(v, b):
        out, inter = model.apply(v, b, method=UniBEV.predict,
                                 mutable=["intermediates"])
        out = dict(out)
        out["sca_overflow"] = max_sca_overflow(inter)
        return out

    return jax.jit(_predict, out_shardings=NamedSharding(mesh, P()))


def predict_dataset(predict: Callable, variables, dataset, idxs: Sequence[int],
                    mesh: Mesh, collate: Callable,
                    batch_size: Optional[int] = None, prefetch: int = 2,
                    ) -> Iterator[Tuple[Sequence[int], list, Dict[str, Any],
                                        Dict[str, np.ndarray], int]]:
    """Yield (chunk, metas, sharded_batch, host_outputs, row0) per batch.

    chunk: the dataset indices of this process's real (non-pad) rows;
    row0: this process's first row in the GLOBAL batch — local row j of the
    chunk lives at host_outputs[...][row0 + j].
    """
    B = batch_size or max(1, jax.local_device_count())
    chunks = [idxs[i:i + B] for i in range(0, len(idxs), B)]
    row0 = jax.process_index() * B

    def make_batch(chunk):
        samples = [dataset[int(i)] for i in chunk]
        while len(samples) < B:              # pad the ragged tail
            samples.append(samples[-1])
        b = collate(samples)
        metas = b.pop("img_metas", [{}] * B)
        sharded = {}
        for k, v in b.items():
            v = np.asarray(v)
            sh = NamedSharding(mesh, P("data", *([None] * (v.ndim - 1))))
            sharded[k] = (jax.make_array_from_process_local_data(sh, v)
                          if jax.process_count() > 1
                          else jax.device_put(v, sh))
        return chunk, metas, sharded

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)

    def producer():
        try:
            for c in chunks:
                q.put(make_batch(c))
            q.put(None)
        except BaseException as e:   # surface loader errors to the consumer
            q.put(e)

    threading.Thread(target=producer, daemon=True).start()

    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        chunk, metas, b = item
        out = jax.device_get(predict(variables, b))
        yield chunk, metas, b, out, row0
