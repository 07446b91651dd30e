package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The S7 scraper's EXTRACTION semantics, in-engine: the reference
  * drives a browser to a listing page and pulls fields out of the DOM
  * (`jobs/propnex_selenium.py:20-165`); the browser-driving half
  * (clicks, scrolls, waits) is out-of-engine by design (SURVEY §1.4),
  * but the field extraction itself is pure text→fields work — exactly
  * what a 100 TB crawl pipeline runs IN Spark over stored pages
  * (fetch separately, parse at scale). This operator replays the
  * scraper's observable extraction over an HTML string column with
  * codegen'd built-ins only (regexp_extract/_all, filter, transform —
  * no UDF, no driver loop): per-row scan work, no shuffle, no state.
  *
  * Parity map (selector → rule), from `propnex_selenium.py`:
  *  - location: first `<h1>` (PN:27 via the details column's h1)
  *  - price: first `strong.mr-1`; price_psf: first `p.mt-2` (PN:29-30)
  *  - `div.lbb-21` list rows dispatch on the row icon's src (PN:40-53):
  *    `ic_location.png`→ the row's `<p>` text, `ic_beds.png`/
  *    `ic_baths.png`/`ic_sqft.png`→ the row's full text. The scraper's
  *    loop ASSIGNS on every match, so the LAST matching row wins —
  *    mirrored with `try_element_at(filter(...), -1)`.
  *  - `div.agent-dt-box`: `h5`→ agent_name; its `<p>` tags dispatch by
  *    content — leading `#R`→ agent_id, containing `+65`→ phone,
  *    lower containing `.com`→ email; last match wins (PN:64-82).
  *  - `div.property-list-box`: `<ul>`s alternate name-list / value-list;
  *    li texts zip into a dict, later duplicate keys overwriting
  *    earlier (Python `dict(zip(...))`), truncated to the shorter side
  *    (Python `zip`); lookups default 'None' (PN:85-100,139-160).
  *  - description: first `div.desc-box` `<p>`, default '' (PN:126-129);
  *    facilities: every `li.facilities-icons` row's `<p>` text joined
  *    with ", " (PN:132-137).
  *  - any absent element → the scraper's 'None' sentinel (its
  *    `get_element_text` default, PN:200-205).
  *
  * Text extraction mirrors Selenium's `.text` on listing markup:
  * `<br>` becomes a newline (the multi-line street/town/district
  * value, FIXTURES.md A1), remaining tags drop, the five standard
  * entities decode, and the result is trimmed. This is class-anchored
  * FLAT extraction — each section is located independently in the
  * page and captured to its nearest `</div>`, so it does not depend
  * on (or handle) div nesting inside a section; on the listing shape
  * the scraper targets (sections contain only ul/li/p/h* markup) the
  * two agree, and HtmlListingSpec pins that agreement on a
  * reference-shaped page. */
object HtmlListing {

  private val None_ = "None"

  /** Selenium-`.text`-alike: `<br>`→newline, tags out, entities
    * decoded, trimmed. */
  private def text(c: Column): Column = {
    val br = regexp_replace(c, "(?i)<br\\s*/?>", "\n")
    val noTags = regexp_replace(br, "<[^>]*>", "")
    val ent = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
        lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
        lit("&amp;"), lit("&"))
    trim(ent)
  }

  /** Class-attribute token match: CSS `.cls` means a whole
    * space-delimited token, so `listing-about` must NOT match inside
    * `listing-about-main-key` (a `\b` boundary would — hyphens are
    * word boundaries). */
  private def classTok(cls: String): String =
    s"""class="(?:[^"]*\\s)?$cls(?:\\s[^"]*)?""""

  private def classPat(tag: String, cls: String): String =
    s"""(?s)<$tag[^>]*${classTok(cls)}[^>]*>(.*?)</$tag>"""

  /** First match of `pat` group 1 as Selenium text; absent → `dflt`.
    * regexp_extract returns '' for both no-match and empty-capture, so
    * absence is distinguished with an rlike guard (same scan, both
    * codegen'd). */
  private def firstText(html: Column, pat: String,
                        dflt: String = None_): Column =
    when(html.rlike(pat), text(regexp_extract(html, pat, 1)))
      .otherwise(lit(dflt))

  private def section(html: Column, cls: String): Column =
    regexp_extract(html, classPat("div", cls), 1)

  /** All `<li>...</li>` blocks of a fragment (outer markup kept, so
    * callers can dispatch on attributes inside). */
  private def liBlocks(frag: Column): Column =
    regexp_extract_all(frag, lit("(?s)<li[^>]*>.*?</li>"), lit(0))

  /** The last block containing `needle`, or null. */
  private def lastWith(blocks: Column, needle: String): Column =
    try_element_at(filter(blocks, b => instr(b, needle) > 0), lit(-1))

  private def pText(frag: Column): Column =
    text(regexp_extract(frag, "(?s)<p[^>]*>(.*?)</p>", 1))

  /** Python-`dict(zip(names, vals))[key]` with 'None' default: the
    * LAST pair whose name equals `key`, over pairs truncated to the
    * shorter list. */
  private def zipLookup(names: Column, vals: Column, key: String): Column = {
    val n = least(size(names), size(vals))
    val pairs = arrays_zip(slice(names, lit(1), n), slice(vals, lit(1), n))
      .cast("array<struct<name:string,value:string>>")
    coalesce(
      try_element_at(filter(pairs, p => p.getField("name") === key), lit(-1))
        .getField("value"),
      lit(None_))
  }

  /** The scraper's 25-field dict over `(url, html)` — same names, same
    * order, same sentinels ('None' / '' / comma-joined facilities) as
    * `propnex_selenium.py:139-165`, so the output feeds
    * `jobs/PropnexJob.transform` exactly like the fixture JSON does. */
  def parsePropnex(url: Column, html: Column): Column = {
    val lis = liBlocks(section(html, "lbb-21"))
    def liText(needle: String, pOnly: Boolean): Column = {
      val hit = lastWith(lis, needle)
      coalesce(when(hit.isNotNull,
        if (pOnly) pText(hit) else text(hit)), lit(None_))
    }
    val agentBox = section(html, "agent-dt-box")
    val agentPs = transform(
      regexp_extract_all(agentBox, lit("(?s)<p[^>]*>(.*?)</p>"), lit(1)),
      p => text(p))
    def agentP(pred: Column => Column): Column =
      coalesce(try_element_at(filter(agentPs, pred), lit(-1)), lit(None_))
    val plBox = section(html, "property-list-box")
    val uls = transform(
      regexp_extract_all(plBox, lit("(?s)<ul[^>]*>.*?</ul>"), lit(0)),
      (u, i) => struct(u.as("u"), i.as("i")))
    def liTexts(ul: Column): Column =
      transform(regexp_extract_all(ul,
        lit("(?s)<li[^>]*>(.*?)</li>"), lit(1)), b => text(b))
    val names = flatten(transform(
      filter(uls, x => x.getField("i") % 2 === 0),
      x => liTexts(x.getField("u"))))
    val vals = flatten(transform(
      filter(uls, x => x.getField("i") % 2 === 1),
      x => liTexts(x.getField("u"))))
    def detail(key: String): Column = zipLookup(names, vals, key)
    val facilities = array_join(transform(
      regexp_extract_all(html,
        lit(classPat("li", "facilities-icons")), lit(0)),
      b => pText(b)), ", ")
    struct(
      url.as("url"),
      firstText(html, "(?s)<h1[^>]*>(.*?)</h1>").as("location"),
      firstText(html, classPat("strong", "mr-1")).as("price"),
      firstText(html, classPat("p", "mt-2")).as("price_psf"),
      liText("ic_location.png", pOnly = true).as("street_town_district"),
      liText("ic_beds.png", pOnly = false).as("num_bedroom"),
      liText("ic_baths.png", pOnly = false).as("num_bathroom"),
      liText("ic_sqft.png", pOnly = false).as("floor_area_sqft"),
      firstText(agentBox, "(?s)<h5[^>]*>(.*?)</h5>").as("agent_name"),
      agentP(p => p.startsWith("#R")).as("agent_id"),
      agentP(p => lower(p).contains(".com")).as("agent_email"),
      agentP(p => p.contains("+65")).as("agent_phone_num"),
      detail("Listing Type").as("listing_type"),
      detail("Property Group").as("property_group"),
      detail("Property Type").as("property_type"),
      detail("District").as("district"),
      detail("Floor Area").as("total_floor_area"),
      detail("TOP").as("top"),
      detail("Furnishing").as("furnishing"),
      detail("Tenure").as("tenure"),
      detail("Floor").as("floor"),
      detail("Post Code").as("post_code"),
      detail("Street Name").as("street_name"),
      firstText(section(html, "desc-box"),
        "(?s)<p[^>]*>(.*?)</p>", dflt = "").as("description"),
      facilities.as("facilities"))
  }

  /** The SRX spider's 31-field dict over `(url, html)`
    * (`jobs/srx_selenium.py:20-152`) — same names (including the
    * literal `/` in `shopping_mall/markets`), same 'None' / '' / ", "
    * conventions, so the output feeds `jobs/SrxJob.transform` exactly
    * like the A2 fixture JSON (FIXTURES.md).
    *
    * SRX-specific extraction shapes, mirrored:
    *  - descendant selectors (`div.listing-price div`, `div.bed-box
    *    span.bed-numbers`, agent name/cea spans) anchor parent and
    *    child in ONE pattern — the child is the parent's first such
    *    descendant.
    *  - agent_phone_num is an ATTRIBUTE read (`a.featuredAgentCall`
    *    @href, SRX:48): the `<a>` tag is located by class token, then
    *    `href="..."` is read from inside the tag, so attribute order
    *    never matters.
    *  - property details zip per-BLOCK key/value divs
    *    (`div.listing-about`) into a dict, last duplicate key winning
    *    (Python `dict(zip(...))`); the 17 lookups default 'None'.
    *  - amenity categories (`div.Trains` / `div.Schools` /
    *    `div.Shopping-Malls` / `div.Markets`) hold nested markup, so
    *    each category REGION is captured from its opener to the next
    *    sibling category opener (or end of page) — the
    *    sibling-delimited capture nested sections need under flat
    *    regex extraction. Trains join "name station" pairs and drop
    *    entries where either half is missing (the scraper's
    *    `'None' not in station` filter, SRX:90); malls and markets
    *    concatenate (SRX:151). */
  def parseSrx(url: Column, html: Column): Column = {
    def descText(parentTag: String, parentCls: String, childPat: String,
                 dflt: String = None_): Column =
      firstText(html,
        s"""(?s)<$parentTag[^>]*${classTok(parentCls)}[^>]*>.*?$childPat""",
        dflt)
    // div#listing-Xvalue-size is an ID anchor, not a class (SRX:30)
    val sizePsf = firstText(html,
      """(?s)<div[^>]*id="listing-Xvalue-size"[^>]*>(.*?)</div>""")
    val phoneHref = {
      val aTag = regexp_extract(html,
        s"""(?s)<a[^>]*${classTok("featuredAgentCall")}[^>]*>""", 0)
      val href = trim(regexp_extract(aTag, """href="([^"]*)"""", 1))
      when(length(aTag) > 0 && length(href) > 0, href).otherwise(lit(None_))
    }
    val aboutBlockPat =
      s"""(?s)<div[^>]*${classTok("listing-about")}[^>]*>\\s*""" +
        s"""<div[^>]*${classTok("listing-about-main-key")}[^>]*>(.*?)</div>\\s*""" +
        s"""<div[^>]*${classTok("listing-about-main-value")}[^>]*>(.*?)</div>"""
    val keys = transform(
      regexp_extract_all(html, lit(aboutBlockPat), lit(1)), k => text(k))
    val vals = transform(
      regexp_extract_all(html, lit(aboutBlockPat), lit(2)), v => text(v))
    def detail(key: String): Column = zipLookup(keys, vals, key)
    val facilities = array_join(transform(
      regexp_extract_all(html,
        lit(s"""(?s)<div[^>]*${classTok("facilities-row")}[^>]*>.*?""" +
          s"""<span[^>]*${classTok("listing-about-facility-span")}""" +
          """[^>]*>(.*?)</span>"""), lit(1)),
      f => text(f)), ", ")
    // sibling-delimited category region: opener up to the next
    // category opener or end of input
    def region(cls: String): Column = {
      val others = Seq("Trains", "Schools", "Shopping-Malls", "Markets")
      regexp_extract(html,
        s"""(?s)<div[^>]*${classTok(cls)}[^>]*>(.*?)""" +
          s"""(?=<div[^>]*class="(?:[^"]*\\s)?(?:${others.mkString("|")})""" +
          """(?:\s[^"]*)?"|$)""", 1)
    }
    // amenity names are text nodes: [^<]* keeps a station-less block
    // from backtrack-bleeding its capture into the NEXT block's name
    val amenityName = s"""<div[^>]*${classTok("listing-amenity-name")}""" +
      """[^>]*>([^<]*)</div>"""
    def amenityNames(reg: Column): Column =
      transform(regexp_extract_all(reg, lit(s"(?s)$amenityName"), lit(1)),
        n => text(n))
    // per-amenity "name station" pair: name div then the station span,
    // within one listing-amenity block; a block missing either half
    // yields no pair — the scraper's "'None' not in station" filter
    // drops exactly those (SRX:90)
    val trainPairPat = s"""(?s)$amenityName\\s*""" +
      s"""<div[^>]*${classTok("listing-amenity-station")}[^>]*>\\s*""" +
      """<span[^>]*>(.*?)</span>"""
    val trainsReg = region("Trains")
    val trains = array_join(zip_with(
      transform(regexp_extract_all(trainsReg, lit(trainPairPat), lit(1)),
        n => text(n)),
      transform(regexp_extract_all(trainsReg, lit(trainPairPat), lit(2)),
        st => text(st)),
      (n, st) => concat(n, lit(" "), st)), ", ")
    val schools = array_join(amenityNames(region("Schools")), ", ")
    val mallsMarkets = array_join(concat(
      amenityNames(region("Shopping-Malls")),
      amenityNames(region("Markets"))), ", ")
    struct(
      url.as("url"),
      firstText(html, classPat("h1", "listing-name")).as("location"),
      sizePsf.as("floor_size_psf"),
      descText("div", "listing-price",
        "<div[^>]*>(.*?)</div>").as("price"),
      descText("div", "bed-box",
        s"""<span[^>]*${classTok("bed-numbers")}[^>]*>(.*?)</span>""")
        .as("num_bedroom"),
      descText("div", "bath-box",
        s"""<span[^>]*${classTok("bath-numbers")}[^>]*>(.*?)</span>""")
        .as("num_bathroom"),
      firstText(html, classPat("div", "listing-description"), dflt = "")
        .as("description"),
      descText("div", "agent-name", "<span[^>]*>(.*?)</span>")
        .as("agent_name"),
      descText("div", "agent-image-cea",
        s"""<div[^>]*${classTok("agent-cea-reg")}[^>]*>(.*?)</div>""")
        .as("agent_id"),
      phoneHref.as("agent_phone_num"),
      detail("Address").as("address"),
      detail("Property Name").as("property_name"),
      detail("Property Type").as("property_type"),
      detail("Model").as("model"),
      detail("Bedrooms").as("bedrooms"),
      detail("Bathrooms").as("bathrooms"),
      detail("Furnish").as("furnish"),
      detail("Floor Level").as("floor_level"),
      detail("Tenure").as("tenure"),
      detail("Developer").as("developer"),
      detail("Built Year").as("built_year"),
      detail("HDB Town").as("hdb_town"),
      detail("Asking").as("asking"),
      detail("Size").as("size"),
      detail("PSF").as("psf"),
      detail("Tenancy Status").as("tenancy_status"),
      detail("Date Listed").as("date_listed"),
      facilities.as("facilities"),
      trains.as("train_stations"),
      schools.as("schools"),
      mallsMarkets.as("shopping_mall/markets"))
  }
}
