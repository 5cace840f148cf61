"""Sources: fixture replay (file-based) and the Binance WebSocket
streaming data source."""
