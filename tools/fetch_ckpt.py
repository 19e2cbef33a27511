"""One-command real-checkpoint activation (VERDICT r4 item 6).

Downloads the ResembleAI/chatterbox checkpoints at the reference's PINNED
revisions (reference tts.py:163 english / tts.py:195 multilingual) into a
local directory and prints the env var that unlocks every weights-gated
check in this repo:

    python tools/fetch_ckpt.py [--variant english|multilingual|both]
                               [--dest ~/.cache/chatterbox_tpu/ckpt]

Then (or in one shot via ``make real-parity``):

    CHATTERBOX_CKPT_DIR=<dest>/english python -m pytest \
        tests/test_real_checkpoint.py -q          # 4 gated goldens
    CHATTERBOX_CKPT_DIR=<dest>/english python tools/eval_quality.py --gate

Zero-egress environments fail fast with a clear message instead of hanging;
if the files are already present the script verifies and exits 0 without
touching the network, so ``make real-parity`` is rerunnable.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_tpu.api.tts import ChatterboxTTS  # noqa: E402

FILES = {
    # reference tts.py:165 / tts.py:197 file sets
    "english": ["ve.safetensors", "t3_cfg.safetensors", "s3gen.safetensors",
                "tokenizer.json", "conds.pt"],
    "multilingual": ["ve.safetensors", "t3_23lang.safetensors",
                     "s3gen.safetensors", "mtl_tokenizer.json", "conds.pt",
                     "Cangjie5_TC.json"],
}


def have_all(dest: Path, variant: str) -> bool:
    return all((dest / f).exists() and (dest / f).stat().st_size > 0
               for f in FILES[variant])


def fetch(variant: str, dest: Path, timeout: float) -> bool:
    dest.mkdir(parents=True, exist_ok=True)
    if have_all(dest, variant):
        print(f"[fetch_ckpt] {variant}: all files already in {dest}")
        return True
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("[fetch_ckpt] huggingface_hub is not installed — install it "
              "or place the files manually in", dest, file=sys.stderr)
        return False
    import socket
    try:
        socket.getaddrinfo("huggingface.co", 443)
    except OSError:
        print("[fetch_ckpt] huggingface.co does not resolve (zero-egress "
              "environment) — skipping download attempts", file=sys.stderr)
        return False
    rev = ChatterboxTTS.HF_REVISION[variant]
    repo = ChatterboxTTS.HF_REPO
    ok = True
    for f in FILES[variant]:
        if (dest / f).exists() and (dest / f).stat().st_size > 0:
            continue
        try:
            p = hf_hub_download(repo, f, revision=rev,
                                etag_timeout=timeout)
            if os.path.lexists(dest / f):   # stale/dangling symlink
                os.unlink(dest / f)
            os.symlink(p, dest / f)
            print(f"[fetch_ckpt] {f} -> {p}")
        except Exception as e:
            print(f"[fetch_ckpt] FAILED {repo}/{f}@{rev[:12]}: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            ok = False
    return ok and have_all(dest, variant)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="english",
                    choices=["english", "multilingual", "both"])
    ap.add_argument("--dest",
                    default=os.path.expanduser("~/.cache/chatterbox_tpu/ckpt"))
    ap.add_argument("--timeout", type=float, default=20.0,
                    help="network timeout (s); zero-egress envs fail fast")
    args = ap.parse_args()
    variants = (["english", "multilingual"] if args.variant == "both"
                else [args.variant])
    rc = 0
    for v in variants:
        dest = Path(args.dest) / v
        if fetch(v, dest, args.timeout):
            print(f"[fetch_ckpt] ready: CHATTERBOX_CKPT_DIR={dest}")
        else:
            print(f"[fetch_ckpt] {v}: INCOMPLETE — this environment has no "
                  "route to huggingface.co; re-run where egress exists, or "
                  f"copy the files listed above into {dest}",
                  file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
