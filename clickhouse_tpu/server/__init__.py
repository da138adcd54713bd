from .http_server import HttpServer, serve
