"""Configuration / experiment-directory system.

Replaces the reference argparse stack (``common/option.py``) with typed
dataclasses + the same CLI flag surface, experiment-dir persistence
(opt.txt + opt.json instead of a pickle), auto-numbered ``expr_N`` dirs and
debug-mode shrinkage (option.py:133-170).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature flags.

    XLA:CPU AOT cache entries embed the compile machine's feature set and
    are REJECTED at load time on a host with different features — and a
    rejected key is never overwritten, so after a VM migration a shared
    cache dir is permanently poisoned (every run pays full recompiles
    while logging cpu_aot_loader feature-mismatch errors).  Keying the
    directory by the feature flags gives each host generation its own
    cache instead."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nofp"


def enable_jit_cache():
    """Enable the persistent XLA compilation cache (one shared definition
    for the CLIs, bench.py, and the test suite).  ``LERF_JIT_CACHE``
    overrides the location; set it empty to disable."""
    import jax
    cache = os.environ.get(
        "LERF_JIT_CACHE",
        os.path.expanduser(f"~/.cache/jax_comp_{_host_fingerprint()}"))
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        # Persist sub-second compiles too: the test suite is ~250 tests
        # whose many small executables otherwise recompile every session.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # Growth control: persisting every small compile with per-host-
        # fingerprint dirs grows without limit (full-suite working set is
        # ~7 GB, 2026-08-21), and dirs orphaned by host migrations
        # (~/.cache/jax_comp_<old fp>) accumulate — prune stale dirs when
        # they pile up (`rm -rf ~/.cache/jax_comp_*` minus the live one).
        # LRU eviction (jax_compilation_cache_max_size) is OPT-IN via
        # LERF_JIT_CACHE_MAX (bytes) because its per-entry atime tracking
        # races under concurrent processes — measured here: parallel
        # pytest runs then fail to persist entries at all ("Error writing
        # persistent compilation cache entry ... -atime"), which costs far
        # more than the disk.  Any bound must exceed the working set or
        # every new entry evicts instantly and the warm cache self-defeats.
        raw = os.environ.get("LERF_JIT_CACHE_MAX", "0")
        try:
            max_sz = int(raw)
        except ValueError:
            raise ValueError(
                f"LERF_JIT_CACHE_MAX={raw!r}: must be an integer byte "
                f"count (0 disables the bound)") from None
        if max_sz > 0:
            jax.config.update("jax_compilation_cache_max_size", max_sz)


@dataclasses.dataclass
class BaseConfig:
    # experiment specifics (option.py:13-41)
    name: str = "lerf"
    model: str = "SRNetsSWF2"
    scale: str = "4"
    nsigma: float = -1.0         # Gaussian noise σ; float like option.py:18
    nf: int = 64
    modes: str = "sct"
    modes2: str = "sct"
    interval: int = 4
    norm: int = 255
    supp_size: int = 2
    in_c: int = 1
    out_c: int = 3
    feat_c: int = 1
    max_sigma: int = 10
    stages: int = 2
    two_stage: bool = False
    linear: bool = False
    model_root: str = "./models"
    exp_dir: str = ""
    debug: bool = False
    platform: str = ""           # "", "cpu", "tpu", ... — jax backend override

    def apply_platform(self):
        """Select the JAX backend before first use (needed because the
        axon TPU plugin force-registers itself at interpreter start), and
        enable the persistent compilation cache — benchmark-set images
        compile one executable per shape, and TPU gather compiles take
        minutes each, so caching makes re-runs and repeated serving of the
        same shapes fast."""
        import jax
        if self.platform:
            jax.config.update("jax_platforms", self.platform)
        enable_jit_cache()

    @property
    def scale_value(self):
        """int for "4", float for "0.5" (option.py:127-131)."""
        return float(self.scale) if "." in self.scale else int(self.scale)

    def resolve_exp_dir(self):
        if self.exp_dir == "":
            model_dir = os.path.join(self.model_root, self.name)
            os.makedirs(model_dir, exist_ok=True)
            count = 1
            while os.path.isdir(os.path.join(model_dir, f"expr_{count}")):
                count += 1
            self.exp_dir = os.path.join(model_dir, f"expr_{count}")
            os.makedirs(self.exp_dir)
        else:
            os.makedirs(self.exp_dir, exist_ok=True)
            self.name = os.path.basename(self.exp_dir.rstrip("/")) \
                + "-" + self.model
        return self.exp_dir

    def snapshot_code(self, out_dir: Optional[str] = None):
        """Snapshot the framework sources into ``{expDir}/code`` for
        experiment provenance (reference option.py:113-119)."""
        import shutil
        out_dir = out_dir or self.exp_dir
        pkg_root = os.path.dirname(os.path.abspath(__file__))
        dst_root = os.path.join(out_dir, "code")
        for dirpath, _, files in os.walk(pkg_root):
            rel = os.path.relpath(dirpath, pkg_root)
            for f in files:
                if f.endswith(".py"):
                    dst = os.path.join(dst_root, rel)
                    os.makedirs(dst, exist_ok=True)
                    shutil.copy2(os.path.join(dirpath, f),
                                 os.path.join(dst, f))

    def save(self, out_dir: Optional[str] = None):
        out_dir = out_dir or self.exp_dir
        os.makedirs(out_dir, exist_ok=True)
        d = dataclasses.asdict(self)
        with open(os.path.join(out_dir, "opt.json"), "w") as f:
            json.dump(d, f, indent=2, sort_keys=True)
        with open(os.path.join(out_dir, "opt.txt"), "w") as f:
            for k in sorted(d):
                f.write(f"{str(k):>25}: {str(d[k]):<30}\n")

    @classmethod
    def load(cls, exp_dir: str):
        with open(os.path.join(exp_dir, "opt.json")) as f:
            d = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


@dataclasses.dataclass
class TrainConfig(BaseConfig):
    # data (option.py:183-189)
    batch_size: int = 16
    crop_size: int = 48
    train_dir: str = "./data/DIV2K"
    val_dir: str = "./data/rrBenchmark"
    val_w_dir: str = "./data/WarpBenchmark"
    lutft: bool = False
    # training (option.py:191-201)
    start_iter: int = 0
    total_iter: int = 50000
    display_step: int = 100
    val_step: int = 2000
    save_step: int = 2000
    lr0: float = 1e-3
    lr1: float = 1e-4
    weight_decay: float = 0.0
    worker_num: int = 8
    # TPU-native additions
    data_axis: int = -1          # -1 = all local devices (pjit DP)
    seed: int = 0
    keep_checkpoints: int = 5
    profile_steps: int = 0       # >0: jax.profiler trace of that many steps
    auto_reseed: int = 3         # dead-run reinit attempts (0 = off)
    device_data: bool = False    # HBM-resident dataset, on-device sampling

    def apply_debug(self):
        """Debug-mode shrinkage (option.py:164-170)."""
        if self.debug:
            self.display_step = 10
            self.save_step = 100
            self.val_step = 50
            self.total_iter = 200
            self.batch_size = 4
            self.nf = 16


@dataclasses.dataclass
class TestConfig(BaseConfig):
    test_dir: str = "./data/rrBenchmark"
    result_root: str = "./results"
    load_iter: int = 50000
    lut_name: str = "LUTft"
    hr_root: str = ""            # optional separate HR root for warp eval
    datasets: str = "Set5"       # comma list of benchmark sets
    scales: str = "2,3,4"        # comma list; 'HxW' pairs allowed
    backend: str = "auto"        # net ensemble: auto|pallas|xla|pallas_int8
    bucket: int = 0              # >0: bucketed serving granularity — one
                                 # compiled program per shape bucket instead
                                 # of per image shape (bit-identical with
                                 # automatic exact fallback;
                                 # pipeline.upscale_bucketed)
    dynamic_warp: bool = False   # warp eval via warp_dynamic: one compiled
                                 # program per (in, out) shape pair across
                                 # ALL homographies (bit-identical;
                                 # pipeline.warp_dynamic)
    dynamic_sr: bool = False     # SR eval via upscale_dynamic: one compiled
                                 # program per (in, out) shape pair across
                                 # ALL scales — with --bucket g, per shape
                                 # bucket (bit-identical;
                                 # pipeline.upscale_dynamic)

    def dataset_list(self):
        return [d for d in self.datasets.split(",") if d]

    def scale_list(self):
        out = []
        for s in self.scales.split(","):
            if not s:
                continue
            if "x" in s:
                h, w = s.split("x")
                out.append((float(h), float(w)))
            else:
                out.append((float(s), float(s)))
        return out


_FLAG_ALIASES = {
    # reference camelCase flag → dataclass field
    "suppSize": "supp_size", "inC": "in_c", "outC": "out_c",
    "featC": "feat_c", "maxSigma": "max_sigma", "twoStage": "two_stage",
    "modelRoot": "model_root", "expDir": "exp_dir",
    "batchSize": "batch_size", "cropSize": "crop_size",
    "trainDir": "train_dir", "valDir": "val_dir", "valWDir": "val_w_dir",
    "startIter": "start_iter", "totalIter": "total_iter",
    "displayStep": "display_step", "valStep": "val_step",
    "saveStep": "save_step", "weightDecay": "weight_decay",
    "workerNum": "worker_num", "testDir": "test_dir",
    "resultRoot": "result_root", "loadIter": "load_iter",
    "lutName": "lut_name", "hrRoot": "hr_root", "outSize": "out_size",
    "dynamicWarp": "dynamic_warp", "dynamicSR": "dynamic_sr",
}


def build_parser(cls) -> argparse.ArgumentParser:
    """argparse front-end accepting both snake_case and the reference's
    camelCase flags (so the reference's documented commands port 1:1)."""
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    inverse = {v: k for k, v in _FLAG_ALIASES.items()}
    for f in dataclasses.fields(cls):
        names = [f"--{f.name}"]
        if f.name in inverse:
            names.append(f"--{inverse[f.name]}")
        if f.name == "exp_dir":
            names.append("-e")
        if f.name == "scale":
            names.append("-r")
        if f.type in ("bool", bool):
            # BooleanOptionalAction (adds --no-<flag>) so a default-True
            # bool field stays controllable from the CLI
            p.add_argument(*names, action=argparse.BooleanOptionalAction,
                           default=f.default)
        else:
            typ = {int: int, float: float, str: str}.get(
                f.type if isinstance(f.type, type) else
                {"int": int, "float": float, "str": str}.get(f.type, str))
            p.add_argument(*names, type=typ, default=f.default)
    return p


def parse_config(cls, argv=None):
    args = build_parser(cls).parse_args(argv)
    cfg = cls(**vars(args))
    cfg.apply_platform()
    return cfg
