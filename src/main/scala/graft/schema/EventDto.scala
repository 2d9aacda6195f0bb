package graft.schema

/** Typed mirror of the staged EventDTO document tree (dto.py:10-139) —
  * the `Dataset[EventDto]` surface for the ingest boundary where
  * compile-time field checks help (SURVEY §1.1/§1.2). The untyped
  * `DataFrame` path (`Schemas.eventDto`) remains the default for the
  * dynamic-schema operators.
  *
  * `related_artists` carries the POST-normalization struct form
  * ([[graft.ingest.StagingReader.liftRelatedArtists]]); use
  * `StagingReader.readStagedTyped` which lifts before the `as[...]`.
  */
case class RelatedArtist(name: Option[String], wwoz_artist_href: Option[String])

case class ArtistData(
    name: Option[String],
    description: Option[String],
    genres: Option[Seq[String]],
    related_artists: Option[Seq[RelatedArtist]],
    wwoz_artist_href: Option[String],
    website: Option[String])

case class VenueData(
    name: Option[String],
    thoroughfare: Option[String],
    phone_number: Option[String],
    locality: Option[String],
    state: Option[String],
    postal_code: Option[String],
    full_address: Option[String],
    is_active: Option[Boolean],
    website: Option[String],
    wwoz_venue_href: Option[String],
    event_artist: Option[String])

case class EventData(
    event_date: Option[String],
    wwoz_event_href: Option[String],
    event_artist: Option[String],
    wwoz_artist_href: Option[String],
    description: Option[String],
    related_artists: Option[Seq[RelatedArtist]],
    genres: Option[Seq[String]])

case class EventDto(
    artist_data: Option[ArtistData],
    venue_data: Option[VenueData],
    event_data: Option[EventData],
    performance_time: Option[String],
    scrape_time: Option[String])
