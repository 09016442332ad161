"""Model zoo: SAM (ViT-B/L/H + TinyViT/MobileSAM) and YOLOv8, in pure JAX."""
