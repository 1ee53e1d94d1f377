"""Query plans / job drivers: the BSP crawl round loop."""
