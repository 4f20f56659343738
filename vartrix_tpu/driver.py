"""Top-level driver: argv -> matrices on disk.

Python equivalent of the reference `_main` (/root/reference/src/main.rs:163-418),
callable in-process for regression tests. Same validation, same metrics,
same outputs; the compute phase is the batched TPU pipeline from
core/pipeline.py instead of a per-variant loop.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from contextlib import contextmanager
from typing import Dict, List, Optional

import numpy as np

from .cli import build_parser
from .core import calls as calls_mod
from .core.pipeline import (
    PipelineArgs,
    collect_reads,
    prepare_variants,
    score_all,
)
from .io.bam import BamReader
from .io.barcodes import load_barcodes, write_barcodes
from .io.fasta import FastaIndex, IndexedFasta
from .io.matrix_market import TriMat, write_matrix_market
from .io.vcf import iter_vcf_records, read_vcf_records
from .utils.metrics import Metrics, log_metrics

log = logging.getLogger("vartrix")


def validate_output_path(p: str) -> None:
    if os.path.exists(p):
        log.error("Output path already exists")
        sys.exit(1)
    parent = os.path.dirname(p)
    if parent and not os.path.isdir(parent):
        log.error("Output directory %r does not exist", parent)
        sys.exit(1)


def check_inputs_exist(fasta_file, vcf_file, bam_file, cell_barcodes,
                       out_matrix_path, out_ref_matrix_path) -> None:
    for path in (fasta_file, vcf_file, bam_file, cell_barcodes):
        if not os.path.exists(path):
            log.error("Input file %s does not exist", path)
            sys.exit(1)
    for p in (out_matrix_path, out_ref_matrix_path):
        validate_output_path(p)
    fai = fasta_file + ".fai"
    if not os.path.exists(fai):
        log.error("File %s does not exist", fai)
        sys.exit(1)
    ext = os.path.splitext(bam_file)[1].lstrip(".")
    if ext == "bam":
        if not (os.path.exists(bam_file + ".bai") or os.path.exists(bam_file + ".csi")):
            log.error("BAM index does not exist. Expecting %s or %s",
                      bam_file + ".bai", bam_file + ".csi")
            sys.exit(1)
    elif ext == "cram":
        if not os.path.exists(bam_file + ".crai"):
            log.error("CRAM index %s does not exist", bam_file + ".crai")
            sys.exit(1)
    else:
        log.error("BAM file did not end in .bam or .cram. Unable to validate")
        sys.exit(1)


def validate_inputs(records, bam: BamReader, fasta_index: FastaIndex) -> None:
    """Cross-check VCF chroms against FASTA and BAM; check variant end fits
    the chromosome (src/main.rs:545-594)."""
    fa_seqs = {e.name for e in fasta_index.sequences()}
    bam_seqs = set(bam.ref_names)
    for rec in records:
        if rec.chrom not in fa_seqs:
            log.error("Sequence %s not seen in FASTA", rec.chrom)
            sys.exit(1)
        if rec.chrom not in bam_seqs:
            log.error("Sequence %s not seen in BAM", rec.chrom)
            sys.exit(1)
        chrom_len = fasta_index.chrom_len(rec.chrom)
        end = rec.pos + len(rec.ref)
        if end > chrom_len:
            log.error(
                "Record %s:%d has end position %d, which is larger than the "
                "chromosome length (%d). Does your FASTA match your VCF?",
                rec.chrom, rec.pos, end, chrom_len)
            sys.exit(1)


def _is_cram(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(4) == b"CRAM"


def open_reads(path: str, fasta_path: str, header_only: bool = False):
    """BamReader for BAM inputs, CramReader (same record interface) for
    CRAM (detected by magic, like htslib)."""
    if _is_cram(path):
        from .io.cram import CramReader
        return CramReader(path, fasta_path)
    return BamReader(path, header_only=header_only)


def write_variants(out_variants: str, vcf_file: str) -> None:
    with open(out_variants, "wt") as f:
        for rec in iter_vcf_records(vcf_file):
            f.write(f"{rec.chrom}_{rec.pos}\n")


_PHASE_TIMES: Dict[str, float] = {}


@contextmanager
def _phase(name: str):
    """Wall-clock a pipeline stage at info level (SURVEY.md §5.1: the
    reference keeps symbols for perf profiling; we report stage timings
    and collect them for --metrics-json)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _PHASE_TIMES[name] = _PHASE_TIMES.get(name, 0.0) + dt
        log.info("Phase %-12s %.2fs", name, dt)


def _maybe_profile(profile_dir: Optional[str]):
    """jax.profiler trace context for the scoring phase (SURVEY.md §5.1:
    the reference's only profiling aid is release-build symbols; here we
    emit a real device trace)."""
    import contextlib

    if not profile_dir:
        return contextlib.nullcontext()
    try:
        import jax
        return jax.profiler.trace(profile_dir)
    except Exception as e:
        log.error("profiling unavailable: %s", e)
        return contextlib.nullcontext()


def _native_host_available() -> bool:
    try:
        from .io.bam_native import native_available
        return native_available()
    except Exception:
        return False


def _select_backend(name: str, n_threads: int = 1, sw_mode: str = "full"):
    """Return score_batch_fn(x, y) -> scores for the requested backend."""
    if sw_mode == "banded":
        # reference-parity banding (rust-bio style k=6/w=20 chained band,
        # src/main.rs:898-901): band construction is always the native
        # host one; the banded DP runs on the TPU (band-masked Pallas
        # kernel, exactly equal to the CPU DP) for --backend tpu/auto,
        # else on the threaded native aligner
        from .ops.sw_native import banded_sw_chained_batch_native, native_available
        if not native_available():
            log.error("--sw-mode banded requires the native CPU aligner "
                      "(build with native/build.sh)")
            sys.exit(1)
        if name in ("tpu", "auto"):
            try:
                from .ops.sw_pallas import _on_tpu
                from .ops.sw_pallas_v2 import make_banded_tpu_scorer
                if _on_tpu() or name == "tpu":
                    return make_banded_tpu_scorer(max(n_threads, 1))
            except Exception as exc:
                log.warning("banded TPU scorer unavailable (%s); using the "
                            "native CPU aligner", exc)
        elif name == "xla":
            log.error("--sw-mode banded has no XLA path; using the native "
                      "CPU aligner")

        def banded(x, y, _nt=max(n_threads, 1)):
            xs = [bytes(row[row != 0]) for row in np.asarray(x)]
            ys = [bytes(row[row != 1]) for row in np.asarray(y)]
            return banded_sw_chained_batch_native(xs, ys, _nt)
        return banded
    if name == "cpu":
        # fastest exact CPU path: native threaded full SW when available
        # (validated against the NumPy oracle), else the oracle itself
        try:
            from .ops.sw_native import full_sw_batch_native, native_available
            if native_available():
                def cpu_native(x, y, _nt=max(n_threads, 1)):
                    import numpy as _np
                    xs = [bytes(row[row != 0]) for row in _np.asarray(x)]
                    ys = [bytes(row[row != 1]) for row in _np.asarray(y)]
                    return full_sw_batch_native(xs, ys, _nt)
                return cpu_native
        except Exception as exc:
            log.warning("native SW library unavailable (%s); falling back "
                        "to the NumPy oracle (~100x slower)", exc)
        from .ops.sw_numpy import sw_scores_batch
        return sw_scores_batch
    if name == "tpu":
        from .ops.sw_pallas_v2 import sw_scores_batch_tpu_v2
        return sw_scores_batch_tpu_v2
    if name == "xla":
        from .ops.sw_xla import sw_scores_batch_xla
        return sw_scores_batch_xla
    # auto
    try:
        import jax
        if any(d.platform == "tpu" for d in jax.devices()):
            from .ops.sw_pallas_v2 import sw_scores_batch_tpu_v2
            return sw_scores_batch_tpu_v2
    except Exception:
        pass
    from .ops.sw_numpy import sw_scores_batch
    return sw_scores_batch


def _stream_score(args, pargs, works, cell_barcodes, score_fn, tid_by_name):
    """Windowed decode->collect->score (--stream N): partitions live
    variants into contiguous N-variant windows, region-decodes each
    window's reads via its own BAI plan, collects+scores, and frees the
    window — peak RSS is bounded to one window, and window k+1's native
    decode runs on a producer thread while window k scores on device.

    Outputs are identical to the monolithic path: a variant lives in
    exactly one window, its window's region plan covers every read
    overlapping its locus (same plan construction as --fetch regions,
    whose whole-vs-regions equality is pinned by tests), and collect
    selects candidates per variant by (tid, pos) range, so extra reads a
    window's chunks happen to include never leak into other variants.
    Per-file UMI ids stay consistent within each variant because all of
    a variant's reads decode in its own window.

    Returns (read_idx, cells_l, umis_l, per_variant_scores) aligned to
    `works`, or None when no usable index exists (caller falls back)."""
    from concurrent.futures import ThreadPoolExecutor

    from .core.fast_pipeline import collect_reads_fast, score_all_fast
    from .io.bai import plan_region_fetch
    from .io.bam_native import ColumnarBam

    V = len(works)
    live = [i for i, w in enumerate(works) if not w.skipped]
    windows = [live[k : k + args.stream]
               for k in range(0, len(live), args.stream)]
    read_idx = [np.zeros(0, np.int64)] * V
    cells_l = [np.zeros(0, np.int32)] * V
    umis_l = [np.zeros(0, np.int64)] * V
    scores: List[Optional[np.ndarray]] = [None] * V

    def plan_of(win):
        loci = [(works[i].locus.chrom, works[i].locus.start,
                 works[i].locus.end) for i in win]
        plan, _frac = plan_region_fetch(args.bam, loci, tid_by_name)
        return plan

    def decode(win):
        plan = plan_of(win)
        if plan is None:
            raise RuntimeError("BAM index became unusable mid-stream")
        return ColumnarBam(args.bam, pargs.bam_tag.encode(),
                           n_threads=max(args.threads, 1), chunks=plan)

    if not windows:
        for i in range(V):
            scores[i] = np.zeros(0, np.int8)
        return read_idx, cells_l, umis_l, scores
    if plan_of(windows[0]) is None:
        return None  # no usable index: monolithic fallback

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(decode, windows[0])
        for t, win in enumerate(windows):
            cbam = fut.result()
            if t + 1 < len(windows):
                fut = ex.submit(decode, windows[t + 1])
            sub_works = [works[i] for i in win]
            ri, cl, ul = collect_reads_fast(cbam, sub_works, cell_barcodes,
                                            pargs)
            sc = score_all_fast(cbam, sub_works, ri, score_fn)
            for k, i in enumerate(win):
                read_idx[i] = ri[k]
                cells_l[i] = cl[k]
                umis_l[i] = ul[k]
                scores[i] = sc[k]
            del cbam
    for i in range(V):
        if scores[i] is None:
            scores[i] = np.zeros(0, np.int8)
    log.info("Streamed %d variants over %d windows of <=%d",
             len(live), len(windows), args.stream)
    return read_idx, cells_l, umis_l, scores


def _main(argv: List[str]) -> None:
    """Full run. argv excludes the program name (pass sys.argv[1:])."""
    plat = os.environ.get("VARTRIX_JAX_PLATFORMS")
    if plat:
        # explicit platform override: some TPU launch environments force
        # JAX_PLATFORMS in sitecustomize, so the plain env var can't
        # select e.g. a virtual CPU mesh; the config API wins over both
        import jax
        jax.config.update("jax_platforms", plat)

    args = build_parser().parse_args(argv)
    _PHASE_TIMES.clear()  # fresh per run (tests call _main in-process)

    level = {"info": logging.INFO, "debug": logging.DEBUG, "error": logging.ERROR}[args.log_level]
    logging.basicConfig(level=level, stream=sys.stderr,
                        format="%(asctime)s [%(levelname)s] %(message)s")
    log.setLevel(level)

    check_inputs_exist(args.fasta, args.vcf, args.bam, args.cell_barcodes,
                       args.out_matrix, args.ref_matrix)

    cell_barcodes = load_barcodes(args.cell_barcodes)
    records = read_vcf_records(args.vcf)
    num_vars = len(records)
    if num_vars == 0:
        log.error("Warning! Zero variants found in input VCF. Output matrices "
                  "will be by definition empty but will still be generated.")
    info_msg = f"Initialized a {num_vars} variants x {len(cell_barcodes)} cell barcodes matrix"
    log.info(info_msg)

    matrix = TriMat((num_vars, len(cell_barcodes)))
    ref_matrix = TriMat((num_vars, len(cell_barcodes)))

    use_native = args.host in ("auto", "native") and _native_host_available()
    if args.host == "native" and not use_native:
        log.error("native host runtime requested but libgenomio unavailable")
        sys.exit(1)
    if args.log_level == "debug" and args.host == "auto":
        # debug logging reports per-read alignments/qnames, which only the
        # reference (Python) path carries; the reference tool's docs call
        # debug logging "very slow" too (README.md:108-110)
        use_native = False

    # validation only needs the header (names/lengths); the record stream
    # is opened by whichever fetch strategy the plan below picks
    with _phase("validate"):
        bam = open_reads(args.bam, args.fasta, header_only=True)
        fasta = IndexedFasta(args.fasta)
        validate_inputs(records, bam, fasta.index)

    pargs = PipelineArgs(
        primary=args.primary_alignments,
        mapq=args.mapq,
        duplicates=args.no_duplicates,
        use_umi=args.umi,
        bam_tag=args.bam_tag,
        valid_chars=args.valid_chars.encode(),
        padding=args.padding,
    )

    dist_rank, dist_count = 0, 1
    if args.distributed:
        from .parallel.multihost import init_distributed
        if args.distributed == "auto":
            dist_rank, dist_count = init_distributed()
        else:
            addr, n_s, rank_s = args.distributed.rsplit(",", 2)
            dist_rank, dist_count = init_distributed(addr, int(n_s), int(rank_s))
        args.num_shards, args.shard_index = dist_count, dist_rank
        log.info("Distributed: process %d/%d", dist_rank, dist_count)

    row_range = None
    if args.num_shards > 1:
        from .parallel.multihost import shard_range
        row_range = shard_range(num_vars, args.num_shards, args.shard_index)
        log.info("Shard %d/%d computes variant rows [%d, %d)",
                 args.shard_index, args.num_shards, *row_range)

    # overlap the whole-file native decode with haplotype construction:
    # they consume disjoint inputs (BAM vs FASTA+VCF), and at cohort
    # scale each costs ~0.6-0.9s. Only started when the fetch decision
    # is already determined to be whole-file — region planning needs the
    # variant windows that prepare_variants produces.
    early_decode = None
    if (use_native and args.stream == 0 and not _is_cram(args.bam)
            and (args.fetch == "whole"
                 or (args.fetch == "auto"
                     and os.path.getsize(args.bam) < 64 * 1024 * 1024))):
        from concurrent.futures import ThreadPoolExecutor

        from .io.bam_native import ColumnarBam as _EarlyCB
        _dec_ex = ThreadPoolExecutor(max_workers=1)
        early_decode = _dec_ex.submit(_EarlyCB, args.bam,
                                      pargs.bam_tag.encode(),
                                      max(args.threads, 1))
        _dec_ex.shutdown(wait=False)

    with _phase("haplotypes"):
        works = prepare_variants(records, fasta, pargs, row_range=row_range)

    # --- fetch planning: whole-file decode vs indexed region decode ---
    # The reference's hot loop is bam.fetch per variant via BAI
    # (src/main.rs:822-826); the batched equivalent is one merged chunk
    # plan over all variant windows. Whole-file decode wins for dense
    # variant sets (sequential IO, parallel inflate); the region plan wins
    # — and bounds memory — when variants cover a small file fraction.
    fetch_chunks = None
    fetch_loci = [(w.locus.chrom, w.locus.start, w.locus.end)
                  for w in works if not w.skipped]
    if (args.fetch == "auto" and not _is_cram(args.bam)
            and os.path.getsize(args.bam) < 64 * 1024 * 1024):
        # planning over a 100k-window VCF costs ~1.4s — more than whole-
        # file decode of a small BAM can ever save; auto skips straight
        # to whole-file below this size (--fetch regions still plans)
        pass
    elif args.fetch != "whole" and not _is_cram(args.bam):
        from .io.bai import plan_region_fetch
        loci = fetch_loci
        plan, frac = plan_region_fetch(args.bam, loci, bam.tid_by_name)
        if plan is not None and not plan and (args.fetch == "auto" or not loci):
            # an empty plan with live variants is indistinguishable from a
            # stub/foreign index; auto stays on the safe whole-file path.
            # With no live variants there is nothing to fetch either way.
            plan = None
        if plan is not None and (args.fetch == "regions" or frac < 0.5):
            fetch_chunks = plan
            log.info("Fetch plan: %d merged chunks covering ~%.1f%% of the "
                     "BAM (indexed region decode)", len(plan), 100 * frac)
        elif args.fetch == "regions":
            log.error("--fetch regions requested but no usable BAM index")
            sys.exit(1)
    if args.mesh_devices and args.sw_mode == "full":
        from .ops.sw_pallas_v2 import make_mesh_scorer
        if args.backend not in ("auto", "tpu"):
            log.error("--mesh-devices uses the Pallas mesh scorer; "
                      "ignoring --backend %s", args.backend)
        n = args.mesh_devices if args.mesh_devices > 0 else 0
        score_fn = make_mesh_scorer(n)
        log.info("Mesh scoring across %d local devices",
                 len(score_fn.mesh.devices))
    else:
        if args.mesh_devices:
            log.error("--mesh-devices is a full-SW device path; "
                      "--sw-mode banded runs on the host aligner instead")
        score_fn = _select_backend(args.backend, args.threads, args.sw_mode)

    # device prewarm: kernel compilation and (in relay environments) the
    # first-execution warm-up can dwarf small runs; fire a tiny scoring
    # call on a background thread so it overlaps the host decode/collect
    # phases instead of serializing in front of the score phase
    try:
        from .ops.sw_pallas import _on_tpu
        if _on_tpu() and (hasattr(score_fn, "compact")
                          or hasattr(score_fn, "pair")):
            import threading

            def _prewarm(fn=score_fn):
                try:
                    fn(np.zeros((1, 16), np.uint8),
                       np.ones((1, 32), np.uint8))
                except Exception as e:  # never sink the run
                    log.debug("prewarm failed: %s", e)
            threading.Thread(target=_prewarm, daemon=True).start()
    except Exception:
        pass

    if use_native:
        from .core import agg_numpy
        from .core.fast_pipeline import collect_reads_fast, score_all_fast
        from .io.bam_native import ColumnarBam

        streamed = None
        if args.stream > 0:
            if _is_cram(args.bam):
                log.info("--stream: CRAM input uses the container-level "
                         "region decode instead; running monolithic")
            elif args.checkpoint_dir:
                log.info("--stream is incompatible with --checkpoint-dir; "
                         "running monolithic")
            else:
                # one phase spans windowed decode+collect+score (they
                # overlap by design, so separate timers would double-count)
                with _phase("stream"), _maybe_profile(args.profile_dir):
                    streamed = _stream_score(args, pargs, works,
                                             cell_barcodes, score_fn,
                                             bam.tid_by_name)
                if streamed is None:
                    log.info("--stream requested but no usable BAM index; "
                             "running monolithic")
        if streamed is not None:
            read_idx, cells_l, umis_l, per_variant_scores = streamed
        else:
            per_variant_scores = None

        bam_path = args.bam
        cram_bytes = None
        if per_variant_scores is None:
            if _is_cram(args.bam):
                # the columnar native decoder consumes BAM byte streams. The
                # C++ CRAM decoder (libcramio) produces one in memory; with
                # --fetch auto/regions and a valid .crai only containers
                # overlapping variant windows decode (the CRAM analog of the
                # BAI region plan). Python transcode remains the fallback
                # for features libcramio doesn't support (exotic codecs;
                # bzip2/lzma blocks decode natively since round 4).
                offs = None
                if args.fetch != "whole":
                    try:
                        from .io.cram import CramReader
                        offs = CramReader(args.bam).containers_for_loci(
                            fetch_loci)
                    except Exception:
                        offs = None
                try:
                    from .io.bam_native import cram_decode_native
                    with _phase("cram-decode"):
                        cram_bytes = cram_decode_native(
                            args.bam, args.fasta, offs, max(args.threads, 1))
                    if offs is not None:
                        log.info("CRAM native region decode: %d of the file's "
                                 "containers", len(offs))
                except Exception as exc:
                    log.info("native CRAM decode unavailable (%s); using the "
                             "Python transcoder", exc)
                    import tempfile
                    from .io.cram import transcode_to_bam
                    tmp = tempfile.NamedTemporaryFile(suffix=".bam", delete=False)
                    tmp.close()
                    loci = fetch_loci if args.fetch != "whole" else None
                    n_rec = transcode_to_bam(args.bam, tmp.name, args.fasta,
                                             loci=loci)
                    if loci is not None:
                        log.info("CRAM region transcode: %d records from "
                                 "index-selected containers", n_rec)
                    bam_path = tmp.name
            with _phase("decode"):
                if (early_decode is not None and fetch_chunks is None
                        and cram_bytes is None):
                    # started before the haplotypes phase; the timer here
                    # measures only the remaining wait
                    cbam = early_decode.result()
                else:
                    cbam = ColumnarBam(bam_path, pargs.bam_tag.encode(),
                                       n_threads=max(args.threads, 1),
                                       chunks=fetch_chunks,
                                       bam_bytes=cram_bytes)
            with _phase("collect"):
                read_idx, cells_l, umis_l = collect_reads_fast(
                    cbam, works, cell_barcodes, pargs)

            ckpt = None
            if args.checkpoint_dir:
                from .core.checkpoint import ScoreCheckpoint, manifest_key
                key = manifest_key(
                    [args.vcf, args.bam, args.fasta, args.cell_barcodes],
                    {"padding": args.padding, "mapq": args.mapq,
                     "primary": args.primary_alignments,
                     "duplicates": args.no_duplicates, "umi": args.umi,
                     "bam_tag": args.bam_tag, "valid_chars": args.valid_chars})
                ckpt = ScoreCheckpoint(args.checkpoint_dir, key)

            with _phase("score"), _maybe_profile(args.profile_dir):
                if ckpt is not None:
                    cached = {}
                    todo = []
                    for wi, w in enumerate(works):
                        arr = ckpt.load(w.row)
                        want = len(read_idx[wi])
                        # (n, 2) int32 scores or (n,) int8 fused call codes
                        if arr is not None and arr.shape in ((want, 2), (want,)):
                            cached[wi] = (arr if arr.ndim == 1
                                          else arr.astype(np.int32))
                        else:
                            todo.append(wi)
                    sub = score_all_fast(cbam, [works[i] for i in todo],
                                         [read_idx[i] for i in todo], score_fn)
                    todo_pos = {wi: k for k, wi in enumerate(todo)}
                    per_variant_scores = []
                    for wi, w in enumerate(works):
                        if wi in cached:
                            per_variant_scores.append(cached[wi])
                        else:
                            arr = sub[todo_pos[wi]]
                            ckpt.save(w.row, arr)
                            per_variant_scores.append(arr)
                    log.info("Checkpoint: %d variants loaded, %d scored",
                             len(cached), len(todo))
                else:
                    per_variant_scores = score_all_fast(cbam, works, read_idx, score_fn)
        log.debug("Finished aligning reads for all variants")

        metrics = Metrics()
        for w in works:
            if w._metrics is not None:  # lazy: untouched rows carry none
                metrics.add(w._metrics)
        with _phase("aggregate"):
            if args.device_agg:
                from .core.agg_device_driver import aggregate_on_device
                g_rows, g_cols, ref_c, alt_c, unk_c = aggregate_on_device(
                    cells_l, umis_l, per_variant_scores, pargs.use_umi)
            else:
                g_rows, g_cols, ref_c, alt_c, unk_c = agg_numpy.aggregate_flat(
                    cells_l, umis_l, per_variant_scores, pargs.use_umi)
        tot = (ref_c + alt_c + unk_c).astype(np.float64)
        if args.scoring_method == "consensus":
            vals = np.where((ref_c > 0) & (alt_c > 0), 3.0,
                            np.where(alt_c > 0, 2.0,
                                     np.where(ref_c > 0, 1.0, 0.0)))
            keep = vals > 0
            matrix.add_triplets(g_rows[keep], g_cols[keep], vals[keep])
        elif args.scoring_method == "alt_frac":
            with np.errstate(invalid="ignore", divide="ignore"):
                vals = alt_c / tot  # 0/0 -> NaN preserved
            matrix.add_triplets(g_rows, g_cols, vals)
        elif args.scoring_method == "coverage":
            matrix.add_triplets(g_rows, g_cols, alt_c)
            ref_matrix.add_triplets(g_rows, g_cols, ref_c)
        else:
            raise ValueError("Scoring method is invalid")
        if log.isEnabledFor(logging.INFO):
            for r, c in zip(g_rows[unk_c > 1], g_cols[unk_c > 1]):
                log.info("Variant at index %d has multiple unknown reads "
                         "at barcode index %d. Check this locus manually",
                         int(r), int(c))
    else:
        if _is_cram(args.bam):
            reads_src = bam  # CramReader decodes its own containers
            if args.fetch != "whole":
                offs = bam.containers_for_loci(fetch_loci)
                if offs is not None:
                    class _CramRegions:
                        ref_names = bam.ref_names
                        ref_lens = bam.ref_lens
                        tid_by_name = bam.tid_by_name

                        @staticmethod
                        def records():
                            return bam.records_for_containers(offs)
                    reads_src = _CramRegions()
                    log.info("CRAM fetch plan: %d of %d containers",
                             len(offs), len(bam.container_offsets()))
        elif fetch_chunks is not None:
            from .io.bai import RegionStream
            reads_src = RegionStream(args.bam, fetch_chunks)
        else:
            reads_src = BamReader(args.bam)
        collect_reads(reads_src, works, cell_barcodes, pargs)
        per_variant_scores = score_all(works, score_fn)
        if log.isEnabledFor(logging.DEBUG):
            from .ops.sw_numpy import pretty_alignment
            for w, sc in zip(works, per_variant_scores):
                locus_str = f"{w.locus.chrom}:{w.locus.start}"
                log.debug("Evaluating record %s", locus_str)
                for k, (seq, qn) in enumerate(zip(w.read_seqs, w.qnames)):
                    log.debug("%s %s ref_aln:\n%s", locus_str, qn.decode(),
                              pretty_alignment(seq, w.rref))
                    log.debug("%s %s alt_aln:\n%s", locus_str, qn.decode(),
                              pretty_alignment(seq, w.alt_hap))
                    log.debug("%s %s ref_score: %d alt_score: %d", locus_str,
                              qn.decode(), int(sc[k, 0]), int(sc[k, 1]))
        log.debug("Finished aligning reads for all variants")

        metrics = Metrics()
        for w, sc in zip(works, per_variant_scores):
            if w._metrics is not None:
                metrics.add(w._metrics)
            # stable sort by cell_index (reference src/main.rs:932)
            order = sorted(range(len(w.cell_indices)), key=lambda k: w.cell_indices[k])
            scores = [
                calls_mod.Scores(
                    cell_index=w.cell_indices[k],
                    umi=w.umis[k],
                    ref_score=int(sc[k, 0]),
                    alt_score=int(sc[k, 1]),
                )
                for k in order
            ]
            i = w.row
            if args.scoring_method == "alt_frac":
                for j, r in calls_mod.alt_frac(scores, i, pargs.use_umi):
                    matrix.add_triplet(i, j, r)
            elif args.scoring_method == "consensus":
                for j, r in calls_mod.consensus_scoring(scores, i, pargs.use_umi):
                    matrix.add_triplet(i, j, r)
            elif args.scoring_method == "coverage":
                alt_res, ref_res = calls_mod.coverage(scores, i, pargs.use_umi)
                for j, r in alt_res:
                    matrix.add_triplet(i, j, r)
                for j, r in ref_res:
                    ref_matrix.add_triplet(i, j, r)
            else:
                raise ValueError("Scoring method is invalid")

    log.debug("Finished scoring alignments for all variants")

    if args.distributed and dist_count > 1:
        from .parallel.multihost import gather_metrics, gather_triplets
        matrix = gather_triplets(matrix, dist_rank, dist_count)
        if args.scoring_method == "coverage":
            ref_matrix = gather_triplets(ref_matrix, dist_rank, dist_count)
        metrics = gather_metrics(metrics, dist_count)
        if dist_rank != 0:
            log_metrics(log, metrics)
            return

    log_metrics(log, metrics)

    with _phase("write"):
        write_matrix_market(args.out_matrix, matrix)
    log.debug("Wrote out matrix file")

    if args.scoring_method == "coverage":
        write_matrix_market(args.ref_matrix, ref_matrix)
        log.debug("Wrote reference matrix file")

    if args.out_variants is not None:
        validate_output_path(args.out_variants)
        write_variants(args.out_variants, args.vcf)
        log.debug("Wrote variants file")

    if args.out_barcodes is not None:
        validate_output_path(args.out_barcodes)
        write_barcodes(args.out_barcodes, cell_barcodes)

    matrix_sum = float(matrix.data.sum()) if matrix.nnz() else 0.0
    if matrix_sum == 0.0:
        log.error("The resulting matrix has a sum of 0. Did you use the --umi "
                  "flag on data without UMIs?")

    if args.metrics_json:
        import json
        payload = {
            "metrics": metrics.as_dict(),
            "phase_seconds": {k: round(v, 4) for k, v in _PHASE_TIMES.items()},
            "matrix": {"shape": list(matrix.shape), "nnz": matrix.nnz()},
            "config": {
                "scoring_method": args.scoring_method, "umi": args.umi,
                "backend": args.backend, "host": ("native" if use_native
                                                  else "python"),
                "sw_mode": args.sw_mode, "fetch": args.fetch,
                "threads": args.threads, "padding": args.padding,
            },
        }
        if args.scoring_method == "coverage":
            payload["ref_matrix_nnz"] = ref_matrix.nnz()
        with open(args.metrics_json, "wt") as f:
            json.dump(payload, f, indent=1)
        log.debug("Wrote metrics JSON")


def main() -> None:
    """CLI entry with the reference's friendly error shell
    (src/main.rs:137-160): print the error chain and a bug-report hint,
    exit 1."""
    import traceback

    from . import __version__

    try:
        _main(sys.argv[1:])
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — mirror the catch-all shell
        print(f"Vartrix error. v{__version__}.")
        print(f"Error: {e}")
        cause = e.__cause__ or e.__context__
        while cause is not None:
            print(f"Info: caused by {cause}")
            cause = cause.__cause__ or cause.__context__
        print()
        traceback.print_exc()
        print("If you think this is a bug, please file an issue and include "
              "the information above and the command-line you used.")
        sys.exit(1)


if __name__ == "__main__":
    main()
