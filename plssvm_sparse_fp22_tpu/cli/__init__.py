"""Command-line tools: ``plssvm-train`` and ``plssvm-predict`` equivalents."""
