"""Instance Segmentation Model (ISM): SAM/FastSAM proposal generation +
three-score template matching (semantic / appearance / geometric)."""
