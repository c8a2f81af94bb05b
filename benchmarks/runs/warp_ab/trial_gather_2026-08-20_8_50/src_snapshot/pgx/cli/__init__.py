"""CLI entry points mirroring the reference's training/eval scripts."""
