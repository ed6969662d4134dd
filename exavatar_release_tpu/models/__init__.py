"""Model layer: SMPL-X/FLAME body-model stack and Gaussian avatar modules."""
