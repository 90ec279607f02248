from mdvalidate_ray.state.sketches import HyperLogLog, BloomFilter, KLLSketch

__all__ = ["HyperLogLog", "BloomFilter", "KLLSketch"]
