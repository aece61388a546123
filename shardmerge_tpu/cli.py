"""Command-line interface.

Parity surface: reference shard/__main__.py — click group with ``merge``
(:83-158), ``copy-model`` (:160-201), ``generate`` (:205-297) — plus the
reference's three standalone scripts mounted as subcommands:
``verify-safetensors``, ``rewrite-reorder``, ``convert-pytorch``.

Extension: ``merge`` auto-detects fully-local configs (every model reference
is an existing directory) and runs offline with no network stack.
"""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path
from typing import Optional

import click

from .backend import BackendError
from .config import ConfigError, MergeConfig

logger = logging.getLogger(__name__)


def setup_logging(verbose: bool):
    level = logging.DEBUG if verbose else logging.INFO
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    )


async def progress_callback(stats):
    print(
        f"\rDownload Progress: {stats.progress_pct:.1f}% | "
        f"Active: {stats.active_workers} | "
        f"Complete: {stats.completed_jobs} | "
        f"Failed: {stats.failed_jobs} | "
        f"Downloaded: {stats.total_downloaded/1024/1024:.1f}MB",
        end="",
    )


def _all_local(config: MergeConfig) -> bool:
    refs = {config.output_base_model}
    for m in config.finetune_merge:
        refs.add(m.model)
        refs.add(m.base)
    local = {r for r in refs if Path(r).is_dir()}
    if local and local != refs:
        # Mixed references are probably a typo'd path: a non-directory ref
        # silently becomes a HuggingFace repo id, which fails with an opaque
        # network error offline.
        logger.warning(
            "Mixed model references: %s resolve to local directories but %s "
            "do not and will be fetched from HuggingFace Hub",
            sorted(local),
            sorted(refs - local),
        )
    return local == refs


def _enable_compile_cache(cache_dir: Path):
    """Persist XLA compilations under the merge cache dir: a Llama family
    has ~6 distinct tensor shapes, each a multi-second TPU compile — reruns
    and resumes should pay none of it.

    An explicit JAX_COMPILATION_CACHE_DIR wins: multi-process launches point
    every worker at ONE stable cache so they stop redundantly compiling the
    same programs (on an oversubscribed host, N cold compiles can stall a
    worker past the 30 s gloo rendezvous window — tests/test_multihost.py)."""
    try:
        import os

        import jax

        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return
        path = Path(cache_dir) / "xla_cache"
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        logger.debug("compilation cache unavailable: %s", e)


async def run_merge(
    config: MergeConfig,
    device: Optional[str] = None,
    clean_cache: bool = False,
    dry_run: bool = False,
    token: Optional[str] = None,
    **kwargs,
):
    """Wire up transport + index + merger and run (reference __main__.py:47-76).

    ``dry_run`` resolves every model index, validates architectures, and
    prints the merge plan (shards, tensors, resume state, placement policy)
    without fetching weights or computing anything."""
    from .backend import resolve_backend
    from .merge import MERGE_METHODS

    # Honor --device/config device and fail FAST on a dead TPU runtime —
    # even a dry run touches jax.devices() (mesh planning below); on a
    # tunneled-TPU host with a dead relay that blocks forever with no
    # diagnostic (backend.py). BackendError propagates to the CLI handler.
    platform = resolve_backend(device)
    logger.info("compute backend: %s", platform)

    _enable_compile_cache(config.cache_path)

    merge_cls = MERGE_METHODS.get(config.merge_method)
    if merge_cls is None:
        raise ConfigError(
            f"Unknown merge_method {config.merge_method!r}; "
            f"choose from {sorted(MERGE_METHODS)}"
        )
    unknown_opts = set(config.method_options) - set(merge_cls.OPTIONS)
    if unknown_opts:
        raise ConfigError(
            f"method_options keys {sorted(unknown_opts)} are not accepted by "
            f"merge_method {config.merge_method!r} "
            f"(accepted: {sorted(merge_cls.OPTIONS) or 'none'})"
        )

    download_manager = None
    if _all_local(config):
        from .io.index import OfflineMultiModelIndex

        logger.info("All model references are local directories; running offline")
        index_manager = OfflineMultiModelIndex()
    else:
        from .io.download import DownloadManager
        from .io.index import HFMultiModelIndex

        download_manager = DownloadManager(
            storage_path=config.storage_path,
            clean_cache=clean_cache,
            max_retries=3,
            token=token,
        )
        download_manager.progress_callbacks.append(progress_callback)
        index_manager = HFMultiModelIndex(
            download_manager=download_manager,
            cache_path=config.cache_path,
            token=token,
        )

    mesh = None
    if config.shard_tensors is not False:
        import jax

        from .parallel.multihost import initialize_distributed, merge_mesh

        # multi-host pods: start the distributed runtime (no-op when
        # single-process) so jax.devices() is the global device set
        initialize_distributed(force=config.distributed)
        if len(jax.devices()) > 1:
            # Default-on (shard_tensors unset): a multi-chip user should
            # never get host-CPU merges for tensors the mesh holds easily —
            # a 70B embed working set divides across devices.
            mesh = merge_mesh()
            logger.info(
                "Sharding tensors >= %d bytes over %d devices (%d hosts)",
                config.shard_min_bytes,
                mesh.devices.size,
                jax.process_count(),
            )
        elif config.shard_tensors:
            logger.info(
                "shard_tensors requested but only one device is visible; "
                "huge tensors will merge on the host CPU backend"
            )

    merger = merge_cls(
        config=config,
        index_manager=index_manager,
        mesh=mesh,
        exact_imag=config.exact_imag,
        shard_min_bytes=config.shard_min_bytes,
        hbm_budget_bytes=(
            int(config.hbm_budget_gb * 2**30)
            if config.hbm_budget_gb is not None
            else None
        ),
        **config.method_options,
        **kwargs,
    )
    if dry_run:
        await _print_plan(merger, config, mesh)
        if clean_cache and download_manager is not None:
            # index resolution may have downloaded index/config files
            await download_manager.cleanup()
        return
    await merger.merge(device=device)

    if clean_cache and download_manager is not None:
        await download_manager.cleanup()


async def _print_plan(merger, config: MergeConfig, mesh):
    """Resolve indexes and print the merge plan without computing.

    The planning writer is read_only: a dry run must not create the output
    directory or write an index file there (a stale dry-run index would be
    loaded in preference to the base index on the next real run)."""
    await merger.initialize()
    layer_order = merger.index_manager.get_layer_order(config.output_base_model)
    writer = merger.get_writer(layer_order, read_only=True)

    done = 0
    n_tensors = 0
    shards = 0
    for shard_layers in writer.shard_layers():
        shards += 1
        for sl in shard_layers:
            n_tensors += 1
            if sl.written:
                done += 1
    click.echo(f"merge plan: {config.merge_method} of "
               f"{len(config.finetune_merge)} finetunes onto "
               f"{config.output_base_model}")
    click.echo(f"  output: {config.output_path} "
               f"({shards} shards, {n_tensors} tensors, dtype {config.output_dtype})")
    if done:
        click.echo(f"  resume: {done}/{n_tensors} tensors already written "
                   "(will be skipped)")
    if mesh is not None:
        click.echo(f"  mesh: {mesh.devices.size} devices; tensors >= "
                   f"{config.shard_min_bytes} bytes row-shard (pad if needed)")
    click.echo(f"  models: " + ", ".join(
        f"{m.model} (base {m.base}, alpha {m.alpha})"
        for m in config.finetune_merge
    ))
    click.echo("  gates: " + (", ".join(
        f"{m.model}[{m.start_layer}:{m.end_layer}]"
        for m in config.finetune_merge
        if m.start_layer != 0 or m.end_layer != -1
    ) or "none"))
    click.echo(f"plan OK — nothing was fetched or computed")


@click.group()
def cli():
    """TPU-native shard merge utility for merging and managing model shards."""


@cli.command("merge")
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@click.option(
    "--cache-dir",
    type=click.Path(path_type=Path),
    default=None,
    help="Directory for caching downloaded files",
)
@click.option("--clean_cache", is_flag=True, help="Delete cached files after merging")
@click.option(
    "--device",
    type=str,
    default=None,
    help="'cpu' forces the host CPU backend; anything else uses the "
    "default JAX backend after a liveness probe (dead remote TPU "
    "runtimes otherwise hang forever)",
)
@click.option(
    "--method",
    type=str,
    default=None,
    help="Merge method: fourier | fourier-legacy | addition | task-addition "
    "| ties | dare | della | breadcrumbs | linear | slerp | model-stock",
)
@click.option(
    "--write-through",
    is_flag=True,
    help="Rewrite output shards after every tensor (reference behavior; "
    "finer-grained resume, heavy IO)",
)
@click.option("--verbose", is_flag=True, help="Enable verbose logging")
@click.option(
    "--trace-dir",
    type=click.Path(path_type=Path),
    default=None,
    help="Capture a jax.profiler trace of the merge into this directory",
)
@click.option(
    "--profile",
    is_flag=True,
    help="Log per-phase wall clock / RSS / HBM (same as SHARDMERGE_PROFILE=1)",
)
@click.option(
    "--dry-run",
    is_flag=True,
    help="Resolve indexes, validate architectures and print the merge plan "
    "without fetching weights or computing",
)
@click.option(
    "--token",
    type=str,
    default=None,
    help="HuggingFace access token for gated/private repos (defaults to "
    "HF_TOKEN or the huggingface-cli login)",
)
@click.option(
    "--output-quant",
    type=click.Choice(["int8", "int4"]),
    default=None,
    help="Additionally write a quantized GPTQ-v2 artifact of the merged "
    "model into <output_dir>-<int8|int4> (loadable by this repo's "
    "generate/serve/merge and any GPTQ-compatible stack)",
)
def merge_command(
    config_file: Path,
    cache_dir: Optional[Path],
    verbose: bool,
    method: Optional[str],
    write_through: bool,
    trace_dir: Optional[Path],
    profile: bool,
    token: Optional[str],
    output_quant: Optional[str],
    **kwargs,
):
    """Merge multiple finetuned models by computing and combining their deltas.

    CONFIG_FILE is a YAML file:

    \b
    output_base_model: "unsloth/Meta-Llama-3.1-70B-Instruct"
    finetune_merge:
      - model: "nvidia/Llama-3.1-Nemotron-70B-Instruct-HF"
        base: "unsloth/Meta-Llama-3.1-70B-Instruct"
        alpha: 0.8
      - model: "another/finetuned-model"
        base: "unsloth/Meta-Llama-3.1-70B-Instruct"
        alpha: 0.5
        start_layer: 2
        end_layer: -2
    output_dir: "merged_model"
    """
    setup_logging(verbose)
    try:
        config = MergeConfig.from_yaml(config_file)
        logger.info("Loaded configuration: %s", config)
        if cache_dir:
            config.cache_dir = str(cache_dir)
        if method:
            config.merge_method = method
        if write_through:
            config.write_through = True
        config.update({k: v for k, v in kwargs.items() if v is not None})

        if profile:
            import os

            os.environ["SHARDMERGE_PROFILE"] = "1"

        from .ops.profiling import trace

        with trace(str(trace_dir) if trace_dir else None):
            asyncio.run(
                run_merge(
                    config=config,
                    dry_run=bool(kwargs.get("dry_run")),
                    token=token,
                    **config.to_dict(),
                )
            )
        if output_quant and not kwargs.get("dry_run"):
            from .tools.quantize_checkpoint import quantize_checkpoint

            bits = int(output_quant.removeprefix("int"))
            dst = str(config.output_path) + f"-{output_quant}"
            report = quantize_checkpoint(config.output_path, dst, bits=bits)
            click.echo(
                f"quantized artifact: {dst} "
                f"({report['tensors_quantized']} tensors, "
                f"{report['compression']}x smaller)"
            )
    except ConfigError as e:
        raise click.BadParameter(str(e))
    except BackendError as e:
        raise click.ClickException(str(e))
    except Exception as e:
        logging.error("Error during merge: %s", e, exc_info=verbose)
        raise click.Abort()


@cli.command("copy-model")
@click.argument("config_file", type=click.Path(exists=True, path_type=Path))
@click.option("--revision", type=str, default="main", help="Model revision/tag")
@click.option(
    "--token",
    type=str,
    default=None,
    help="HuggingFace access token for gated/private repos (defaults to "
    "HF_TOKEN or the huggingface-cli login)",
)
@click.option("--verbose", is_flag=True, help="Enable verbose logging")
def copy_model_command(
    config_file: Path, revision: str, token: Optional[str], verbose: bool
):
    """Copy model configuration files from HuggingFace to the output directory."""
    setup_logging(verbose)
    try:
        from .io.writer import ModelWriter

        config = MergeConfig.from_yaml(config_file)
        input_model = (
            config.input_model.model if config.input_model else config.output_base_model
        )
        logger.info(
            "Copying model configuration from %s to %s", input_model, config.output_path
        )
        ModelWriter.from_huggingface(
            model_id=input_model,
            output_path=config.output_path,
            layer_order=[],
            revision=revision,
            token=token,
        )
        logger.info("Successfully copied model configuration files")
    except ConfigError as e:
        raise click.BadParameter(str(e))
    except Exception as e:
        logging.error("Error copying model configuration: %s", e, exc_info=verbose)
        raise click.Abort()


@cli.command("generate")
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.argument("prompt", type=str)
@click.option("--max-tokens", type=int, default=512, help="Max tokens to generate")
@click.option("--temperature", type=float, default=0.7, help="Sampling temperature")
@click.option("--top-p", type=float, default=0.95, help="Nucleus sampling")
@click.option("--top-k", type=int, default=40, help="Top-k sampling")
@click.option(
    "--repetition-penalty", type=float, default=1.1, help="Repetition penalty"
)
@click.option(
    "--greedy/--no-greedy",
    default=False,
    help="Greedy argmax decoding (the reference always decodes greedily "
    "regardless of sampling flags; here sampling works and --greedy opts in)",
)
@click.option("-4", "--load-in-4bit", is_flag=True, help="int4 weight quantization")
@click.option("-8", "--load-in-8bit", is_flag=True, help="int8 weight quantization")
@click.option("--seed", type=int, default=0, help="Sampling PRNG seed")
@click.option(
    "--device",
    type=str,
    default=None,
    help="'cpu' forces the host CPU backend; default probes the JAX "
    "backend for liveness first",
)
@click.option(
    "--draft-model",
    type=click.Path(exists=True, path_type=Path),
    default=None,
    help="Smaller same-vocab checkpoint for speculative decoding "
    "(greedy only; output identical, fewer target dispatches)",
)
@click.option(
    "--speculation-k", type=int, default=4, help="Speculative tokens per round"
)
@click.option(
    "--shard",
    is_flag=True,
    help="Tensor-parallelize the model over all visible devices",
)
@click.option(
    "--decode-chunk",
    type=click.IntRange(1, 64),
    default=1,
    help="Decode steps per device call (throughput mode: identical "
    "tokens, ~1/S the per-token dispatch latency, S-token emission "
    "granularity)",
)
def generate_command(
    model_path: Path,
    prompt: str,
    max_tokens: int,
    temperature: float,
    top_p: float,
    top_k: int,
    repetition_penalty: float,
    greedy: bool,
    load_in_4bit: bool,
    load_in_8bit: bool,
    seed: int,
    device: Optional[str],
    draft_model: Optional[Path],
    speculation_k: int,
    shard: bool,
    decode_chunk: int,
):
    """Generate text from a merged model with the JAX inference engine."""
    try:
        from .backend import resolve_backend

        resolve_backend(device)
        from .inference import InferenceEngine

        engine = InferenceEngine.from_pretrained(
            str(model_path),
            load_in_4bit=load_in_4bit,
            load_in_8bit=load_in_8bit,
            draft_model=str(draft_model) if draft_model else None,
            speculation_k=speculation_k,
            shard=shard,
        )
        for chunk in engine.stream_generation(
            prompt=prompt,
            max_new_tokens=max_tokens,
            temperature=temperature,
            top_p=top_p,
            top_k=top_k,
            repetition_penalty=repetition_penalty,
            greedy=greedy,
            seed=seed,
            decode_chunk=decode_chunk,
        ):
            print(chunk, end="", flush=True)
        print()
    except BackendError as e:
        raise click.ClickException(str(e))
    except Exception as e:
        logging.error("Error during text generation: %s", e)
        raise click.Abort()


@cli.command("serve")
@click.argument("model_path", type=click.Path(exists=True, path_type=Path))
@click.option("--host", type=str, default="127.0.0.1", help="Bind address")
@click.option("--port", type=int, default=8000, help="Bind port")
@click.option("-4", "--load-in-4bit", is_flag=True, help="int4 weight quantization")
@click.option("-8", "--load-in-8bit", is_flag=True, help="int8 weight quantization")
@click.option(
    "--draft-model",
    type=click.Path(exists=True, path_type=Path),
    default=None,
    help="Speculative-decoding draft checkpoint (greedy requests)",
)
@click.option(
    "--speculation-k", type=int, default=4, help="Speculative tokens per round"
)
@click.option(
    "--shard",
    is_flag=True,
    help="Tensor-parallelize the model over all visible devices",
)
@click.option(
    "--batch-window-ms",
    type=float,
    default=0.0,
    help="Coalesce concurrent compatible requests arriving within this "
    "window into one lockstep decode (0 = off)",
)
@click.option(
    "--prefix-cache",
    type=click.IntRange(0, 64),
    default=0,
    help="Keep N prompt-prefix KV slabs on device: single-prompt "
    "requests sharing a system prompt skip its prefill (0 = off)",
)
@click.option(
    "--continuous",
    type=click.IntRange(0, 64),
    default=0,
    help="Serve greedy requests from a continuously-batched pool of N "
    "slots: requests join the running decode mid-flight and free their "
    "slot as they finish (0 = off)",
)
@click.option(
    "--continuous-cache-len",
    type=click.IntRange(256, 131072),
    default=2048,
    help="KV cache length of the continuous pool (prompt + budget of a "
    "request must fit)",
)
@click.option(
    "--continuous-prefill-chunk",
    type=click.IntRange(64, 4096),
    default=None,
    help="Admission prefill slice (tokens) for the continuous pool: an "
    "arriving prompt stalls active decode by at most one slice between "
    "pool steps (default: the engine's prompt chunk, 512)",
)
@click.option(
    "--warmup",
    is_flag=True,
    help="Compile the serving hot path (prefill + fused decode, batcher "
    "and pool shapes) BEFORE the port opens — on TPU hosts with slow "
    "first compiles the first request otherwise pays the wall",
)
@click.option(
    "--device",
    type=str,
    default=None,
    help="'cpu' forces the host CPU backend; default probes the JAX "
    "backend for liveness first",
)
def serve_command(
    model_path: Path,
    host: str,
    port: int,
    load_in_4bit: bool,
    load_in_8bit: bool,
    draft_model: Optional[Path],
    speculation_k: int,
    shard: bool,
    batch_window_ms: float,
    prefix_cache: int,
    continuous: int,
    continuous_cache_len: int,
    continuous_prefill_chunk: Optional[int],
    warmup: bool,
    device: Optional[str],
):
    """Serve a merged model over HTTP (OpenAI-style /v1/completions).

    List-valued prompts run the batched lockstep decode; see
    shardmerge_tpu/serve.py for the API shape.
    """
    import time

    from .backend import resolve_backend

    try:
        resolve_backend(device)
    except BackendError as e:
        raise click.ClickException(str(e))

    from .serve import serve

    server = serve(
        str(model_path),
        host=host,
        port=port,
        load_in_4bit=load_in_4bit,
        load_in_8bit=load_in_8bit,
        draft_model=str(draft_model) if draft_model else None,
        speculation_k=speculation_k,
        shard=shard,
        batch_window_ms=batch_window_ms,
        prefix_cache=prefix_cache,
        continuous=continuous,
        continuous_cache_len=continuous_cache_len,
        continuous_prefill_chunk=continuous_prefill_chunk,
        warmup=warmup,
    )
    click.echo(f"Serving {model_path} on http://{host}:{port} (Ctrl-C to stop)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


@cli.command("quantize")
@click.argument("src", type=click.Path(exists=True, path_type=Path))
@click.argument("dst", type=click.Path(path_type=Path))
@click.option(
    "--bits",
    type=click.Choice(["4", "8"]),
    default="4",
    help="Quantization width (GPTQ-v2 serialization either way)",
)
@click.option(
    "--no-check",
    is_flag=True,
    help="Skip the per-tensor round-trip verification pass",
)
@click.option("--verbose", is_flag=True, help="Enable verbose logging")
def quantize_command(src: Path, dst: Path, bits: str, no_check: bool, verbose: bool):
    """Write a quantized GPTQ-v2 artifact of a checkpoint directory.

    Symmetric per-output-channel quantization (the serving scheme) in the
    Hub-standard gptq_v2 packed serialization: the artifact loads in this
    repo's generate/serve/merge paths and in any GPTQ-compatible stack.
    """
    import json as _json

    setup_logging(verbose)
    from .tools.quantize_checkpoint import quantize_checkpoint

    try:
        report = quantize_checkpoint(
            src, dst, bits=int(bits), check=not no_check
        )
    except (FileNotFoundError, ValueError, AssertionError) as e:
        raise click.ClickException(str(e))
    click.echo(_json.dumps(report))


@cli.command("verify-safetensors")
@click.option("--model_dir", type=click.Path(exists=True, path_type=Path), required=True)
@click.option("--index_path", type=click.Path(path_type=Path), default=None)
@click.option("--repair", is_flag=True, help="Rebuild the index from shard files")
def verify_command(model_dir: Path, index_path: Optional[Path], repair: bool):
    """Verify (and optionally repair) index <-> shard alignment."""
    from .tools.verify_safetensors import main as verify_main

    ok = verify_main(model_dir, index_path, repair)
    if not ok:
        raise click.exceptions.Exit(1)


@cli.command("fuse-lora")
@click.argument("base_dir", type=click.Path(exists=True, path_type=Path))
@click.argument("adapter_dir", type=click.Path(exists=True, path_type=Path))
@click.argument("output_dir", type=click.Path(path_type=Path))
@click.option(
    "--scale",
    type=float,
    default=None,
    help="Override the adapter's own lora_alpha/r scaling",
)
@click.option(
    "--device",
    type=str,
    default=None,
    help="'cpu' forces the host CPU backend; default probes the JAX "
    "backend for liveness first (the fused updates are jitted)",
)
def fuse_lora_command(
    base_dir: Path, adapter_dir: Path, output_dir: Path,
    scale: Optional[float], device: Optional[str],
):
    """Fuse a PEFT LoRA adapter into a full checkpoint (W + s*B@A).

    The result keeps the base's shard layout/index and is an ordinary
    checkpoint: merge it, serve it, or hand it to HF tooling."""
    from .backend import resolve_backend
    from .tools.fuse_lora import fuse_lora

    try:
        resolve_backend(device)
    except BackendError as e:
        raise click.ClickException(str(e))

    summary = fuse_lora(base_dir, adapter_dir, output_dir, scale=scale)
    click.echo(
        f"Fused {summary['fused_tensors']} tensors at scale "
        f"{summary['scale']:g} across {summary['shards']} shard(s) "
        f"-> {output_dir}"
    )


@cli.command("extract-lora")
@click.argument("base_dir", type=click.Path(exists=True, path_type=Path))
@click.argument("finetuned_dir", type=click.Path(exists=True, path_type=Path))
@click.argument("output_dir", type=click.Path(path_type=Path))
@click.option("--rank", type=click.IntRange(1, 4096), default=16,
              help="Adapter rank (truncated-SVD rank of each delta)")
@click.option(
    "--target",
    "targets",
    multiple=True,
    help="Module-name suffix to extract (repeatable; default: the "
    "standard q/k/v/o/gate/up/down projections)",
)
def extract_lora_command(
    base_dir: Path, finetuned_dir: Path, output_dir: Path, rank: int,
    targets: tuple,
):
    """Extract a PEFT LoRA adapter approximating finetuned - base.

    The inverse of fuse-lora: per targeted 2-D weight, the delta's best
    rank-r factors (truncated SVD) become lora_B @ lora_A with
    lora_alpha = r, so fusing the adapter back reproduces base + the
    rank-r approximation exactly."""
    from .tools.extract_lora import extract_lora

    summary = extract_lora(
        base_dir, finetuned_dir, output_dir, rank=rank,
        target_modules=(list(targets) or None),
    )
    click.echo(
        f"Extracted rank-{summary['rank']} adapter: {summary['tensors']} "
        f"tensor pairs, worst Frobenius capture "
        f"{summary['capture_min']:.4f} -> {output_dir}"
    )


@cli.command("rewrite-reorder")
@click.argument("input_dir", type=click.Path(exists=True, path_type=Path))
@click.argument("output_dir", type=click.Path(path_type=Path))
@click.option("--num-shards", type=int, default=None, help="Target shard count")
def rewrite_reorder_command(input_dir: Path, output_dir: Path, num_shards: Optional[int]):
    """Reorder tensors into canonical transformer order and reshard."""
    from .tools.rewrite_reorder import reshard_and_reorder

    reshard_and_reorder(input_dir, output_dir, num_shards)


@cli.command("inspect")
@click.argument("model_dir", type=click.Path(exists=True, path_type=Path))
def inspect_command(model_dir: Path):
    """Summarize a safetensors model directory (shards, dtypes, layers)."""
    from .tools.inspect_model import inspect_model

    inspect_model(model_dir)


@cli.command("compare")
@click.argument("dir_a", type=click.Path(exists=True, path_type=Path))
@click.argument("dir_b", type=click.Path(exists=True, path_type=Path))
@click.option("--top", type=int, default=10, help="Show N worst tensors")
@click.option(
    "--max-rel",
    type=float,
    default=None,
    help="Exit nonzero if any tensor exceeds this max relative error",
)
def compare_command(dir_a: Path, dir_b: Path, top: int, max_rel: Optional[float]):
    """Tensor-wise diff of two models (merge validation)."""
    from .tools.inspect_model import compare_models

    stats, only_a, only_b = compare_models(dir_a, dir_b, top=top)
    if max_rel is not None:
        worst = max((s.get("max_rel", float("inf")) for s in stats), default=0.0)
        if worst > max_rel or only_a or only_b:
            raise click.exceptions.Exit(1)


@cli.command("convert-pytorch")
@click.argument("input_path", type=click.Path(exists=True, path_type=Path))
@click.argument("output_dir", type=click.Path(path_type=Path))
@click.option("--num-shards", type=int, default=None, help="Target shard count")
def convert_pytorch_command(input_path: Path, output_dir: Path, num_shards: Optional[int]):
    """Convert PyTorch .bin checkpoints to sharded safetensors."""
    from .tools.convert_pytorch_to_hf import convert

    convert(input_path, output_dir, num_shards)


if __name__ == "__main__":
    cli()
