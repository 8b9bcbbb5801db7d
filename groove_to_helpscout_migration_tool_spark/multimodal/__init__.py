"""Multimodal column plumbing (binary payloads + typed metadata)."""

from .decode import (
    IMAGE_META_SCHEMA,
    sniff_mime,
    decode_images,
    extract_audio_features,
    sample_video_frames,
)

__all__ = [
    "IMAGE_META_SCHEMA",
    "sniff_mime",
    "decode_images",
    "extract_audio_features",
    "sample_video_frames",
]
