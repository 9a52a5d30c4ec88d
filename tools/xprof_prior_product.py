"""Capture a REAL XPlane/XProf trace of the production prior train step
(VERDICT r4 #1: all prior backward attribution was synthetic slope chains;
this captures the actual `make_train_step` product program on the chip).

Writes a TensorBoard-compatible trace under --logdir, then (if the trace
contains an XPlane .pb) prints a per-op table aggregated from the
device plane via tensorflow's profiler proto parser if available, else
leaves the raw files for offline XProf.

Usage: python tools/xprof_prior_product.py [--batch 20] [--steps 3]
       [--logdir /tmp/xprof_prior]
"""

import argparse
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def summarize_xspace(logdir):
    """Best-effort: parse the .xplane.pb with the bundled protobuf schema.

    The XSpace proto is self-describing enough for op-level totals:
    planes → lines → events (offset/duration ps, metadata name refs).
    We decode with the tensorboard_plugin_profile proto if importable,
    else fall back to a minimal hand-rolled wire-format walk.
    """
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no .xplane.pb found — trace may be host-only; files:",
              glob.glob(os.path.join(logdir, "**", "*"), recursive=True))
        return
    path = max(paths, key=os.path.getmtime)
    print(f"parsing {path} ({os.path.getsize(path)} bytes)")
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2  # type: ignore
        xspace = xplane_pb2.XSpace()
        xspace.ParseFromString(open(path, "rb").read())
    except ImportError:
        xspace = _parse_xspace_minimal(open(path, "rb").read())
    for plane in xspace.planes:
        total_by_name = {}
        metadata = {m.id: m.name for m in getattr(plane, "event_metadata",
                                                  {}).values()} \
            if hasattr(plane, "event_metadata") else plane["event_metadata"]
        lines = plane.lines if hasattr(plane, "lines") else plane["lines"]
        name = plane.name if hasattr(plane, "name") else plane["name"]
        for line in lines:
            events = line.events if hasattr(line, "events") else line["events"]
            for ev in events:
                mid = ev.metadata_id if hasattr(ev, "metadata_id") else ev["metadata_id"]
                dur = ev.duration_ps if hasattr(ev, "duration_ps") else ev["duration_ps"]
                nm = metadata.get(mid, f"id{mid}")
                total_by_name[nm] = total_by_name.get(nm, 0) + dur
        if not total_by_name:
            continue
        print(f"\n=== plane: {name} ===")
        top = sorted(total_by_name.items(), key=lambda kv: -kv[1])[:40]
        tot = sum(total_by_name.values())
        for nm, ps in top:
            print(f"{ps / 1e9:10.3f} ms  {100.0 * ps / tot:5.1f}%  {nm}")


class _Obj(dict):
    pass


def _parse_xspace_minimal(data):
    """Minimal protobuf wire-format parse of XSpace:
    XSpace{ planes=1: XPlane }
    XPlane{ id=1, name=2, lines=3: XLine, event_metadata=4: map<int64, XEventMetadata> }
    XLine{ id=1, ..., events=4... }  — field numbers per xplane.proto
    XEvent{ metadata_id=1, offset_ps=2?, duration_ps=3? }
    We only need plane.name, line.events (metadata_id, duration_ps),
    and event_metadata names. Unknown fields are skipped by wire type.
    """

    def varint(buf, i):
        r = 0
        s = 0
        while True:
            b = buf[i]
            r |= (b & 0x7F) << s
            i += 1
            if not b & 0x80:
                return r, i
            s += 7

    def fields(buf):
        i = 0
        n = len(buf)
        while i < n:
            tag, i = varint(buf, i)
            fnum, wt = tag >> 3, tag & 7
            if wt == 0:
                v, i = varint(buf, i)
            elif wt == 2:
                ln, i = varint(buf, i)
                v = buf[i:i + ln]
                i += ln
            elif wt == 5:
                v = buf[i:i + 4]
                i += 4
            elif wt == 1:
                v = buf[i:i + 8]
                i += 8
            else:
                raise ValueError(f"wire type {wt}")
            yield fnum, wt, v

    def parse_event(buf):
        ev = {"metadata_id": 0, "duration_ps": 0}
        for fnum, wt, v in fields(buf):
            if fnum == 1 and wt == 0:
                ev["metadata_id"] = v
            elif fnum == 3 and wt == 0:
                ev["duration_ps"] = v
        return ev

    def parse_line(buf):
        ln = {"events": []}
        for fnum, wt, v in fields(buf):
            if fnum == 4 and wt == 2:
                ln["events"].append(parse_event(v))
        return ln

    def parse_md(buf):
        md = {"id": 0, "name": ""}
        for fnum, wt, v in fields(buf):
            if fnum == 1 and wt == 0:
                md["id"] = v
            elif fnum == 2 and wt == 2:
                md["name"] = v.decode("utf-8", "replace")
        return md

    def parse_md_entry(buf):
        key, val = 0, {"id": 0, "name": ""}
        for fnum, wt, v in fields(buf):
            if fnum == 1 and wt == 0:
                key = v
            elif fnum == 2 and wt == 2:
                val = parse_md(v)
        return key, val

    def parse_plane(buf):
        pl = {"name": "", "lines": [], "event_metadata": {}}
        for fnum, wt, v in fields(buf):
            if fnum == 2 and wt == 2:
                pl["name"] = v.decode("utf-8", "replace")
            elif fnum == 3 and wt == 2:
                pl["lines"].append(parse_line(v))
            elif fnum == 4 and wt == 2:
                k, val = parse_md_entry(v)
                pl["event_metadata"][k] = val["name"]
        return pl

    space = _Obj(planes=[])
    planes = []
    for fnum, wt, v in fields(data):
        if fnum == 1 and wt == 2:
            planes.append(parse_plane(v))
    out = _Obj()
    out.planes = planes
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/xprof_prior")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        summarize_xspace(args.logdir)
        return

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from scade_tpu.prior.model import DepthModelCIMLE, PriorConfig, zero_shifts
    from scade_tpu.prior.train import (
        PriorTrainConfig,
        make_prior_optimizer,
        make_train_step,
    )

    cfg = PriorConfig(d_latent=32)
    model = DepthModelCIMLE(cfg)
    tc = PriorTrainConfig(compute_dtype=args.compute_dtype)
    S, B = args.image_size, args.batch
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32),
        "depth": jnp.asarray(
            np.abs(rng.normal(size=(B, S, S, 1))) + 0.5, jnp.float32),
        "planes": jnp.asarray(rng.integers(0, 8, size=(B, S, S)), jnp.int32),
        "focal_length": jnp.full((B,), 500.0, jnp.float32),
        "quality_flg": jnp.full((B,), 3, jnp.int32),
    }
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, cfg.d_latent))
    shifts = zero_shifts(cfg)

    print("init + compile ...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"][:1], z[:1],
                           shifts, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = make_prior_optimizer(params, tc)
    opt_state = opt.init(params)
    step = make_train_step(model, tc, opt)
    for _ in range(2):  # compile + warm OUTSIDE the trace
        params, batch_stats, opt_state, total, _ = step(
            params, batch_stats, opt_state, shifts, batch, z, key)
        np.asarray(total)

    print(f"tracing {args.steps} steps → {args.logdir}", flush=True)
    jax.profiler.start_trace(args.logdir)
    acc = None
    for i in range(args.steps):
        params, batch_stats, opt_state, total, _ = step(
            params, batch_stats, opt_state, shifts, batch, z,
            jax.random.fold_in(key, i))
        acc = total if acc is None else acc + total
    np.asarray(acc)  # materialize INSIDE the trace (deferred-exec tunnel)
    jax.profiler.stop_trace()
    print("trace done")
    summarize_xspace(args.logdir)


if __name__ == "__main__":
    main()
