"""Static context tables: initial RDFa context, host-language wiring,
known URI schemes.

Data reproduced from the reference (these are *published W3C context
data*, not code): initial context at
``/root/reference/pyRdfa/initialcontext.py:23-117``, host tables at
``host/__init__.py:48-98``, scheme list at ``__init__.py:313-347``.
"""

from __future__ import annotations

from ..dom.sniff import HostLanguage

XHTML_PREFIX = "xhv"
XHTML_URI = "http://www.w3.org/1999/xhtml/vocab#"

# --- initial context: http://www.w3.org/2011/rdfa-context/rdfa-1.1 ----
RDFA_11_NS = {
    "as": "https://www.w3.org/ns/activitystreams#",
    "csvw": "http://www.w3.org/ns/csvw#",
    "dcat": "http://www.w3.org/ns/dcat#",
    "dqv": "http://www.w3.org/ns/dqv#",
    "duv": "https://www.w3.org/ns/duv#",
    "qb": "http://purl.org/linked-data/cube#",
    "org": "http://www.w3.org/ns/org#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "gr": "http://purl.org/goodrelations/v1#",
    "ctag": "http://commontag.org/ns#",
    "cc": "http://creativecommons.org/ns#",
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "jsonld": "http://www.w3.org/ns/json-ld#",
    "ldp": "http://www.w3.org/ns/ldp#",
    "oa": "http://www.w3.org/ns/oa#",
    "rif": "http://www.w3.org/2007/rif#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    "rr": "http://www.w3.org/ns/r2rml#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rev": "http://purl.org/stuff/rev#",
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "void": "http://rdfs.org/ns/void#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "og": "http://ogp.me/ns#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "v": "http://rdf.data-vocabulary.org/#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "schema": "http://schema.org/",
    "ssn": "http://www.w3.org/ns/ssn/",
    "sosa": "http://www.w3.org/ns/sosa/",
    "time": "http://www.w3.org/2006/time#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "sd": "http://www.w3.org/ns/sparql-service-description#",
    "prov": "http://www.w3.org/ns/prov#",
    "odrl": "http://www.w3.org/ns/odrl/2/",
}

RDFA_11_TERMS = {
    "describedby": "http://www.w3.org/2007/05/powder-s#describedby",
    "role": "http://www.w3.org/1999/xhtml/vocab#role",
    "license": "http://www.w3.org/1999/xhtml/vocab#license",
}

# --- initial context: http://www.w3.org/2011/rdfa-context/xhtml-rdfa-1.1
XHTML_TERMS = {
    t: XHTML_URI + t
    for t in [
        "alternate", "appendix", "cite", "bookmark", "chapter", "contents",
        "copyright", "glossary", "help", "icon", "index", "meta", "next",
        "license", "p3pv1", "prev", "previous", "role", "section",
        "stylesheet", "subsection", "start", "up", "last", "first", "top",
    ]
}

# host -> ordered initial-context ids (host/__init__.py:48-56)
_CTX_RDFA = ("rdfa-1.1",)
_CTX_XHTML = ("rdfa-1.1", "xhtml-rdfa-1.1")
INITIAL_CONTEXTS = {
    HostLanguage.xhtml: _CTX_XHTML,
    HostLanguage.xhtml5: _CTX_RDFA,
    HostLanguage.html5: _CTX_RDFA,
    HostLanguage.rdfa_core: _CTX_RDFA,
    HostLanguage.atom: _CTX_RDFA,
    HostLanguage.svg: _CTX_RDFA,
}

CONTEXT_DATA = {
    "rdfa-1.1": {"ns": RDFA_11_NS, "terms": RDFA_11_TERMS, "vocabulary": ""},
    "xhtml-rdfa-1.1": {"ns": {}, "terms": XHTML_TERMS, "vocabulary": ""},
}

DEFAULT_VOCABULARY = {HostLanguage.atom: "http://www.iana.org/assignments/relation/"}

ACCEPT_XML_BASE = frozenset(
    [HostLanguage.rdfa_core, HostLanguage.atom, HostLanguage.svg, HostLanguage.xhtml5]
)
ACCEPT_XML_LANG = frozenset([HostLanguage.rdfa_core, HostLanguage.atom, HostLanguage.svg])
ACCEPT_EMBEDDED_RDF_XML = frozenset([HostLanguage.svg, HostLanguage.rdfa_core])
ACCEPT_EMBEDDED_TURTLE = frozenset(
    [HostLanguage.svg, HostLanguage.html5, HostLanguage.xhtml5, HostLanguage.xhtml]
)
REQUIRE_EMBEDDED_RDF = frozenset([HostLanguage.svg])
WARN_XMLNS_USAGE = frozenset([HostLanguage.html5, HostLanguage.xhtml5, HostLanguage.xhtml])
HTML_HOSTS = frozenset([HostLanguage.xhtml, HostLanguage.html5, HostLanguage.xhtml5])

# terms hardwired for (X)HTML + RDFa 1.0 (host/__init__.py:96-98)
PREDEFINED_1_0_REL = [
    "alternate", "appendix", "cite", "bookmark", "chapter", "contents",
    "copyright", "glossary", "help", "icon", "index", "meta", "next", "p3pv1",
    "prev", "previous", "role", "section", "subsection", "start", "license",
    "up", "last", "stylesheet", "first", "top",
]

# recognized URI schemes (reference __init__.py:313-347)
URI_SCHEMES = frozenset(
    """aaa aaas acap cap cid crid data dav dict did dns fax file ftp geo go
    gopher h323 http https iax icap im imap info ipp iris ldap lsid mailto mid
    modem msrp msrps mtqp mupdate news nfs nntp opaquelocktoken pop pres
    prospero rstp rsync service shttp sieve sip sips sms snmp soap tag tel
    telnet tftp thismessage tn3270 tip tv urn vemmi wais ws wss xmpp
    about adiumxtra aim apt afp aw bitcoin bolo callto chrome coap content cvs
    doi ed2k facetime feed finger fish git gg gizmoproject gtalk irc ircs irc6
    itms jar javascript keyparc lastfm ldaps magnet maps market message mms
    msnim mumble mvn notes palm paparazzi psync rmi secondlife sgn skype
    spotify ssh sftp smb soldat steam svn teamspeak things udb unreal ut2004
    ventrillo view-source webcal wtai wyciwyg xfire xri ymsgr
    mailserver pack snews videotex
    afs dtn dvb icon ipn jms oid ni
    hdl isbn issn mstp rtmp rtspu stp""".split()
)
