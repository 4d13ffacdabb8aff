"""Multimodal (binary) column plumbing."""

from .binary import decode_image_meta, extract_patch_features, multimodal_meta

__all__ = ["multimodal_meta", "decode_image_meta", "extract_patch_features"]
