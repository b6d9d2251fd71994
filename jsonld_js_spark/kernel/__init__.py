"""Pure-Python JSON-LD 1.1 kernel (zero Spark imports).

The single-node oracle for tests and the engine behind the Arrow-UDF
generic-document path. See SURVEY.md §7 step 1.
"""

from .api import (  # noqa: F401
    ContextResolver, JsonLdError, compact, expand, flatten, frame, from_rdf,
    link, merge, parse_nquads, register_rdf_parser, serialize_nquads, to_rdf,
    unregister_rdf_parser,
)
from .util import IdentifierIssuer  # noqa: F401
from .loaders import (  # noqa: F401
    as_context_loader, build_headers, http_document_loader, jsonld_get,
    parse_link_header,
)
