from .api import EngineServer, build_app, serve
