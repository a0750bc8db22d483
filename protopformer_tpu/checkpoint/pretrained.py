"""Pretrained-weight URL registry + cached fetch.

The reference's step-one workflow downloads stock DeiT/CaiT ImageNet
weights at model-build time: every timm registration carries an FB-hosted
URL and ``pretrained=True`` pulls it through ``torch.hub`` with
``check_hash=True`` (ref: tools/deit_features.py:10-62,
tools/deit_models_attn.py:292-296, tools/cait_models_attn.py:22-31).

Equivalent surface here: ``resolve_pretrained(spec)`` accepts

  * a registered architecture name  -> its URL, downloaded into the cache
  * an ``http(s)://`` / ``file://`` URL -> downloaded into the cache
  * a local path                       -> returned as-is

so ``--pretrained_ckpt deit_tiny_patch16_224`` works like the reference's
``deit_tiny_patch_features(pretrained=True)``. Downloads are cached under
``$PPF_CACHE_DIR`` (default ``~/.cache/protopformer_tpu``) keyed by
filename; FB checkpoints embed the first 8 sha256 hex chars in the
filename (``-a1311bcf.pth``) and the fetch verifies them like torch.hub's
``check_hash=True`` does.
"""

from __future__ import annotations

import hashlib
import os
import re
import urllib.request

# arch -> URL, one entry per reference registration that publishes weights
# (ref: deit_models_attn.py:292-296/:307-311/:322-326/:337-341/:352-356/
# :367-371/:382-386/:397-401; cait_models_attn.py:22-31). The tiny-image
# smoke registrations (deit_tiny_patch2_*) publish none in the reference
# either (their url lines are commented out — deit_models_attn.py:414,430).
PRETRAINED_URLS = {
    "deit_tiny_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_tiny_patch16_224-a1311bcf.pth",
    "deit_small_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_small_patch16_224-cd65a155.pth",
    "deit_base_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_224-b5f2ef4d.pth",
    "deit_tiny_distilled_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_tiny_distilled_patch16_224-b40b3cf7.pth",
    "deit_small_distilled_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_small_distilled_patch16_224-649709d9.pth",
    "deit_base_distilled_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/deit_base_distilled_patch16_224-df68dfff.pth",
    "deit_base_patch16_384":
        "https://dl.fbaipublicfiles.com/deit/deit_base_patch16_384-8de9b5d1.pth",
    "deit_base_distilled_patch16_384":
        "https://dl.fbaipublicfiles.com/deit/deit_base_distilled_patch16_384-d0272ac0.pth",
    "cait_xxs24_224": "https://dl.fbaipublicfiles.com/deit/XXS24_224.pth",
    "cait_s24_224": "https://dl.fbaipublicfiles.com/deit/S24_224.pth",
}

_HASH_RE = re.compile(r"-([a-f0-9]{8,})\.pth$")


def cache_dir() -> str:
    return os.environ.get(
        "PPF_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "protopformer_tpu"),
    )


def _check_hash(path: str, filename: str) -> None:
    """torch.hub ``check_hash`` convention: the filename suffix is a prefix
    of the file's sha256 (ref: deit_models_attn.py:294 check_hash=True)."""
    m = _HASH_RE.search(filename)
    if not m:
        return
    want = m.group(1)
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    got = h.hexdigest()
    if not got.startswith(want):
        os.remove(path)
        raise RuntimeError(
            f"hash mismatch for {filename}: sha256 {got[:len(want)]} != "
            f"{want} (corrupt download removed; retry)"
        )


def download_to_cache(url: str, progress_logger=None) -> str:
    """Fetch ``url`` into the cache (once) and return the local path."""
    os.makedirs(cache_dir(), exist_ok=True)
    filename = os.path.basename(url.rstrip("/")) or "ckpt.pth"
    local = os.path.join(cache_dir(), filename)
    if os.path.isfile(local):
        return local
    if progress_logger is not None:
        progress_logger.info(f"downloading {url} -> {local}")
    tmp = local + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, local)
    _check_hash(local, filename)
    return local


def resolve_pretrained(spec: str, progress_logger=None) -> str:
    """Registered name / URL / local path -> local checkpoint path."""
    if spec in PRETRAINED_URLS:
        return download_to_cache(PRETRAINED_URLS[spec], progress_logger)
    if spec.startswith(("http://", "https://", "file://")):
        return download_to_cache(spec, progress_logger)
    if os.path.isfile(spec):
        return spec
    known = ", ".join(sorted(PRETRAINED_URLS))
    raise FileNotFoundError(
        f"--pretrained_ckpt {spec!r} is not a file, URL, or registered "
        f"architecture (known: {known})"
    )
