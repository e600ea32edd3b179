"""HTTP serving surface (aiohttp.web) + launcher."""
